"""The four merged registry entries equal the composition of their r3
parts (merges made to fit every capability inside the driver's
50-entry snapshot cap — see build_queries' docstring):

- references_pipeline  = extract_references → resolved_references → bibtex
- extract_views        = extract_titles + extract_xml_spatials + extract_mark_svg
- multimodal_pipeline  = multimodal_decode + multimodal_resize + multimodal_frames
- curate_corpus        = r3 curate_corpus rows, neardup reps flagged
"""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"


def test_references_pipeline_equals_parts(ray_session):
    from pdfextract_ray.pipelines.queries import (q_bibtex,
                                                  q_extract_references,
                                                  q_references_pipeline,
                                                  q_resolved_references)
    merged = q_references_pipeline(SF).to_pandas() \
        .sort_values(["url", "ref_order"], ignore_index=True)
    refs = q_extract_references(SF).to_pandas() \
        .sort_values(["url", "ref_order"], ignore_index=True)
    resolved = q_resolved_references(SF).to_pandas() \
        .sort_values(["url", "ref_order"], ignore_index=True)
    bib = q_bibtex(SF).to_pandas() \
        .sort_values(["url", "ref_order"], ignore_index=True)

    assert len(merged) == len(refs) > 0
    assert merged["ref_content"].tolist() == refs["ref_content"].tolist()
    for col in ("doi", "score", "resolved_by"):
        assert merged[col].equals(resolved[col]), col  # NaN-aware
    kept = merged[merged["bibtex"].notna()].reset_index(drop=True)
    assert kept["bibtex"].tolist() == bib["bibtex"].tolist()
    # the BibView cut: bibtex present exactly when score >= 1
    assert (merged["bibtex"].notna() == (merged["score"] >= 1)).all()


def test_extract_views_equals_parts(ray_session):
    from pdfextract_ray.pipelines.queries import (q_extract_mark_svg,
                                                  q_extract_titles,
                                                  q_extract_views,
                                                  q_extract_xml_spatials)
    merged = q_extract_views(SF).to_pandas() \
        .sort_values("url", ignore_index=True)
    titles = q_extract_titles(SF).to_pandas() \
        .sort_values("url", ignore_index=True)
    xmls = q_extract_xml_spatials(SF).to_pandas() \
        .sort_values("url", ignore_index=True)
    svgs = q_extract_mark_svg(SF).to_pandas() \
        .sort_values("url", ignore_index=True)

    assert len(merged) == len(titles) > 0
    assert merged["url"].tolist() == titles["url"].tolist()
    assert merged["title"].tolist() == titles["title"].tolist()
    assert merged["xml"].tolist() == xmls["xml"].tolist()
    assert merged["svg"].tolist() == svgs["svg"].tolist()


def test_multimodal_pipeline_equals_parts(ray_session):
    from pdfextract_ray.pipelines.queries import (q_multimodal_decode,
                                                  q_multimodal_frames,
                                                  q_multimodal_pipeline,
                                                  q_multimodal_resize)
    merged = q_multimodal_pipeline(SF).to_pandas() \
        .sort_values("media_id", ignore_index=True)
    dec = q_multimodal_decode(SF).to_pandas() \
        .sort_values("media_id", ignore_index=True)
    res = q_multimodal_resize(SF).to_pandas() \
        .sort_values("media_id", ignore_index=True)

    assert len(merged) == len(dec) > 0
    assert merged["width"].tolist() == dec["width"].tolist()
    assert merged["height"].tolist() == dec["height"].tolist()
    assert merged["decoded"].tolist() == dec["decoded"].tolist()

    imgs = merged[merged["kind"] == "image"].set_index("media_id")
    res_imgs = res[res["kind"] == "image"].set_index("media_id")
    assert (imgs["resized_width"].astype("int64")
            == res_imgs["width"].astype("int64")).all()
    # frames: md5 over the standalone explosion, concatenated in order
    from pdfextract_ray.pipelines.queries import _read
    from pdfextract_ray.stages.multimodal import (SampleFrames,
                                                  synth_real_media_batch)
    media = _read(SF, "documents", ["doc_id", "text"]) \
        .map_batches(synth_real_media_batch, batch_format="pyarrow")
    frames = media.map_batches(SampleFrames, batch_format="pyarrow",
                               batch_size=64, concurrency=(1, 2)).to_pandas()
    frames = frames.sort_values(["media_id", "frame_index"])
    expect = frames.groupby("media_id")["frame"] \
        .apply(lambda s: hashlib.md5(b"".join(s)).hexdigest())
    aud = merged[merged["kind"] == "audio"].set_index("media_id")
    assert aud["frames_md5"].to_dict() == expect.to_dict()
    assert (aud["n_frames"] == 4).all()
    assert imgs["resized_md5"].notna().all()
    assert aud["resized_md5"].isna().all()


def test_curate_annotated_equals_parts(ray_session):
    from pdfextract_ray.pipelines.queries import (q_curate_corpus,
                                                  q_curate_corpus_annotated,
                                                  q_curate_corpus_neardup)
    ann = q_curate_corpus_annotated(SF).to_pandas() \
        .sort_values("url", ignore_index=True)
    exact = q_curate_corpus(SF).to_pandas().sort_values("url",
                                                        ignore_index=True)
    reps = q_curate_corpus_neardup(SF).to_pandas() \
        .sort_values("url", ignore_index=True)

    assert ann["url"].tolist() == exact["url"].tolist()
    flagged = ann[ann["is_representative"]].reset_index(drop=True)
    assert flagged["url"].tolist() == reps["url"].tolist()
    for col in ("lang", "title", "n_refs", "n_tokens"):
        assert ann[col].tolist() == exact[col].tolist(), col
