"""Pure-Python per-document extraction kernel (no Ray imports).

Every stage of the reference's live path (SURVEY.md §3.1) is a pure
function over lists of plain dicts ("spatial objects"); the Ray layer
wraps :func:`pdfextract_ray.kernel.document.run_document` in a
``map_batches`` actor pool. Keeping the kernel Ray-free lets the golden
fixture suite pin byte-identical behavior without a cluster.
"""

from pdfextract_ray.kernel.document import run_document, ExtractResult  # noqa: F401
