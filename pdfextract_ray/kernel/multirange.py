"""1-D interval-union sketch.

Semantic parity with the reference's ``MultiRange``
(``lib/pdf/extract/multi_range.rb:3-78``), including its order
sensitivity: merged ranges are appended at the END of the range list and
surviving non-incident ranges keep their relative order — downstream
column emission iterates ``ranges`` in that stored order
(``analysis/columns.rb:81-83``), so list order is load-bearing.

Ranges are closed intervals ``[lo, hi]`` (Ruby ``Range#include?`` on
floats is inclusive at both ends).
"""

from __future__ import annotations


class MultiRange:
    __slots__ = ("ranges",)

    def __init__(self) -> None:
        self.ranges: list[tuple[float, float]] = []

    def append(self, lo: float, hi: float) -> None:
        # multi_range.rb:10-27 — collect incident ranges (sharing at least
        # one endpoint-inclusive overlap), merge them with the new range,
        # append the merged range after the surviving non-incident ones.
        if not self.ranges:
            self.ranges.append((lo, hi))
            return
        incident = []
        non_incident = []
        for r in self.ranges:
            rlo, rhi = r
            if (rlo <= lo <= rhi) or (rlo <= hi <= rhi) or (lo <= rlo <= hi) or (lo <= rhi <= hi):
                incident.append(r)
            else:
                non_incident.append(r)
        incident.append((lo, hi))
        merged = (min(r[0] for r in incident), max(r[1] for r in incident))
        non_incident.append(merged)
        self.ranges = non_incident

    @property
    def count(self) -> int:
        return len(self.ranges)

    @property
    def min(self) -> float:
        return min(r[0] for r in self.ranges)

    @property
    def max(self) -> float:
        return max(r[1] for r in self.ranges)

    @property
    def max_excluded(self) -> float:
        """Lower edge of the topmost run (multi_range.rb:29-35)."""
        if len(self.ranges) == 1:
            return self.ranges[0][1]
        return max(self.ranges, key=lambda r: r[0])[0]

    @property
    def min_excluded(self) -> float:
        """Upper edge of the bottommost run (multi_range.rb:37-43)."""
        if len(self.ranges) == 1:
            return self.ranges[0][0]
        return min(self.ranges, key=lambda r: r[1])[1]

    @property
    def widest(self) -> float:
        # multi_range.rb:53-56 — stable sort by width, take LAST.
        ordered = sorted(self.ranges, key=lambda r: r[1] - r[0])
        w = ordered[-1]
        return w[1] - w[0]

    @property
    def narrowest(self) -> float:
        ordered = sorted(self.ranges, key=lambda r: r[1] - r[0])
        n = ordered[0]
        return n[1] - n[0]

    @property
    def avg(self) -> float:
        return sum(r[1] - r[0] for r in self.ranges) / float(len(self.ranges))

    @property
    def covered(self) -> float:
        return sum(r[1] - r[0] for r in self.ranges)
