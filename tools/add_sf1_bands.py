#!/usr/bin/env python3
"""Fold repeated heavy-tier chunk records into BENCH_sf1.json variance bands.

VERDICT r15 #4: the Pregel tier's ±15% warm-to-warm band was the only
measured noise band at sf1 — single-run ratios for the other >=2 s
heavies carried no error bars, so a future "regression" or "win" claim
on them could not be sized. This reads the committed BENCH_sf1.json
plus >=2 chunk records of the SAME query set measured back-to-back
(one host-day), and books per query:

    "sf1_band": {"min": .., "median": .., "max": .., "runs": N}

alongside the existing fields; sf1_sec becomes the band median and the
ratio is recomputed from it. Rows not covered by the chunks are left
untouched. Each chunk's calibration brackets are appended to the
artifact's calibration list tagged "band", so the band's own quietness
is auditable.

Usage: python3 tools/add_sf1_bands.py BENCH_sf1.json BENCH_full.json run1.json run2.json [...]
"""
import json
import statistics
import sys


def main():
    sf1_path, full_path, *runs = sys.argv[1:]
    with open(sf1_path) as f:
        art = json.load(f)
    with open(full_path) as f:
        sf01 = json.load(f)["queries"]

    series = {}  # short key -> [chunk medians]
    for path in runs:
        with open(path) as f:
            rec = json.load(f)
        for q, t in rec["queries"].items():
            series.setdefault(q, []).append(t)
        art.setdefault("calibration", []).append({
            "chunk": path.split("/")[-1],
            "tag": "band",
            "queries": sorted(rec["queries"]),
            "calib_cpu_sec": [rec["calib_cpu_sec"], rec["calib_cpu_end_sec"]],
            "calib_write_mbps": [rec["calib_write_mbps"],
                                 rec["calib_write_end_mbps"]],
            "calib_hostext_max": rec.get("calib_hostext_max"),
            "repeats": rec["repeats"],
        })

    for q, ts in sorted(series.items()):
        med = statistics.median(ts)
        ref = next((v for k, v in sf01.items()
                    if k == q or k.startswith(q + "_")), None)
        row = art["queries"].setdefault(q, {})
        row["sf1_sec"] = round(med, 2)
        row["sf01_sec"] = round(ref, 2) if ref is not None else None
        row["ratio"] = round(med / ref, 2) if ref else None
        row["sf1_band"] = {
            "min": round(min(ts), 2),
            "median": round(med, 2),
            "max": round(max(ts), 2),
            "runs": len(ts),
        }

    with open(sf1_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"banded {len(series)} rows from {len(runs)} runs -> {sf1_path}")


if __name__ == "__main__":
    main()
