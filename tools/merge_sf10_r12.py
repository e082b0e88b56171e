"""Merge the round-12 sf10 scale-parity re-run into
CORRECTNESS_SCALE_sf10.json.

Same process split as the r11 merge (tools/merge_sf10_artifact.py): the
69-query main run in one process, the two span-family value checks in
their own processes (the monolithic run OOMs the in-process DuckDB next
to the resident Spark collect — r9/r10/r11 standing finding), and
d_span_clean_keep1 via the doc-range-sharded disk-backed oracle
(tools/check_span_scale.py).

Usage: python tools/merge_sf10_r12.py
Reads: /tmp/scale_sf10_check_r12.json  (main, 69 queries)
       /tmp/scale_sf10_span_r12.json   (d_span_clean solo)
       /tmp/scale_sf10_decon_r12.json  (d_decontaminate solo)
       /tmp/span_scale_sf10_r12.json   (d_span_clean_keep1 sharded)
"""

from __future__ import annotations

import json

NOTE = (
    "round-12 final HEAD, second session (CC-mirror label broadcast, "
    "split-repair for monolithic layouts, json-only envelope decode "
    "short-circuit, analyzed-relation memoization, corpus-stats cache); "
    ".scale/sf10 regenerated from .scale/sf1 x10 before the run"
)

OOM_NOTE = (
    "re-run in its own process: the monolithic run OOMs the in-process "
    "DuckDB next to the resident Spark collect of the span family "
    "(r9/r10/r11 standing finding); alone it passes the ordinary value check"
)

main = json.load(open("/tmp/scale_sf10_check_r12.json"))["results"]
assert len(main) == 69, len(main)

solo_span = json.load(open("/tmp/scale_sf10_span_r12.json"))["results"]
solo_decon = json.load(open("/tmp/scale_sf10_decon_r12.json"))["results"]
keep1 = json.load(open("/tmp/span_scale_sf10_r12.json"))["results"]

for name, src, note in (
    ("d_span_clean", solo_span, OOM_NOTE),
    ("d_decontaminate", solo_decon, OOM_NOTE),
    (
        "d_span_clean_keep1",
        keep1,
        "full value parity via the doc-range-sharded disk-backed DuckDB "
        "oracle (tools/check_span_scale.py) — the monolithic oracle "
        "exceeds container memory at 500k docs even solo (r9-r11 finding)",
    ),
):
    rec = src[name]
    assert rec["status"] == "pass", (name, rec)
    rec["note"] = note
    main[name] = rec

prev = json.load(open("CORRECTNESS_SCALE_sf10.json"))["results"]
for q, rec in main.items():
    assert rec["status"] == "pass", (q, rec)
    rec["reverified"] = NOTE
    if q in prev and "rows" in prev[q] and prev[q]["rows"] != rec["rows"]:
        print(f"ROW DELTA {q}: {prev[q]['rows']} -> {rec['rows']}")

out = {"results": main, "sf_dir": "/root/repo/.scale/sf10"}
with open("CORRECTNESS_SCALE_sf10.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote CORRECTNESS_SCALE_sf10.json: {len(main)}/72 pass")
