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
        ranges = self.ranges
        if not ranges:
            ranges.append((lo, hi))
            return
        if len(ranges) == 1:
            # dominant case (single-column text): merged-or-appended in
            # place, same order as the general path ([merged] vs
            # [old, new])
            rlo, rhi = ranges[0]
            if (rlo <= lo <= rhi) or (rlo <= hi <= rhi) \
                    or (lo <= rlo <= hi) or (lo <= rhi <= hi):
                ranges[0] = (rlo if rlo < lo else lo,
                             rhi if rhi > hi else hi)
            else:
                ranges.append((lo, hi))
            return
        # general path: merged bounds accumulate inline (identical to
        # min/max over the incident set including the new range)
        mlo, mhi = lo, hi
        non_incident = []
        for r in ranges:
            rlo, rhi = r
            if (rlo <= lo <= rhi) or (rlo <= hi <= rhi) or (lo <= rlo <= hi) or (lo <= rhi <= hi):
                if rlo < mlo:
                    mlo = rlo
                if rhi > mhi:
                    mhi = rhi
            else:
                non_incident.append(r)
        non_incident.append((mlo, mhi))
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
