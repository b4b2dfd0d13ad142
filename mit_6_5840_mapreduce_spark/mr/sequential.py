"""Pure-Python sequential MapReduce oracle mirroring the reference's
``mrsequential`` (``src/main/mrsequential.go:38-87``): map every input,
sort the combined intermediate by key, scan key-equal runs, reduce each,
emit "key value" lines.

Used by the test harness as the golden side of the differential check,
exactly as ``src/main/test-mr.sh:81-83`` uses the sequential binary.
"""

from __future__ import annotations

from collections.abc import Sequence

from mit_6_5840_mapreduce_spark.mr.api import MapF, ReduceF


def mr_sequential(
    mapf: MapF,
    reducef: ReduceF,
    inputs: Sequence[tuple[str, str]],
) -> list[str]:
    intermediate: list[tuple[str, str]] = []
    for name, contents in inputs:
        intermediate.extend(mapf(name, contents))
    intermediate.sort(key=lambda kv: kv[0])

    lines: list[str] = []
    i = 0
    while i < len(intermediate):
        j = i
        while j < len(intermediate) and intermediate[j][0] == intermediate[i][0]:
            j += 1
        key = intermediate[i][0]
        values = [kv[1] for kv in intermediate[i:j]]
        lines.append(f"{key} {reducef(key, values)}")
        i = j
    return lines
