#!/usr/bin/env python3
"""Assemble BENCH_sf1.json from the heavy-tier chunk records.

The sf1 heavy-tier bench (VERDICT r10 item 1) runs as several
SPARK_GRAFT_ONLY chunks (each under the 10-minute capture window, each
with its own calibration brackets) against the ScaleUp-derived corpus
in benchdata/sf1. This script merges the chunk records with the
committed sf0.1 quiet map (BENCH_full.json) into one artifact carrying,
per query: the sf1 median, the sf0.1 reference, and the sf1/sf0.1 ratio
— the measured answer to "does this plan survive 10x growth".

Usage: python3 tools/make_bench_sf1.py BENCH_full.json out.json chunk1.json [chunk2.json ...]
"""
import json
import sys


def main():
    full_path, out_path, *chunks = sys.argv[1:]
    with open(full_path) as f:
        sf01 = json.load(f)["queries"]

    queries = {}
    brackets = []
    for path in chunks:
        with open(path) as f:
            rec = json.load(f)
        queries.update(rec["queries"])
        brackets.append({
            "chunk": path.split("/")[-1],
            "queries": sorted(rec["queries"]),
            "calib_cpu_sec": [rec["calib_cpu_sec"], rec["calib_cpu_end_sec"]],
            "calib_write_mbps": [rec["calib_write_mbps"],
                                 rec["calib_write_end_mbps"]],
            "repeats": rec["repeats"],
        })

    rows = {}
    for q, t1 in sorted(queries.items()):
        # chunk records use short qNN keys; the sf0.1 full map uses full
        # names — match on the qNN prefix
        ref = next((v for k, v in sf01.items()
                    if k == q or k.startswith(q + "_")), None)
        rows[q] = {
            "sf1_sec": round(t1, 2),
            "sf01_sec": round(ref, 2) if ref is not None else None,
            "ratio": round(t1 / ref, 2) if ref else None,
        }

    out = {
        "metric": "sf1_heavy_tier",
        "sf": "sf1 (ScaleUp 10x tiled from sf0.1; graft.ScaleUp scaladoc)",
        "protocol": "SPARK_GRAFT_ONLY chunks, 3 warm repeats, median; "
                    "isolation per SURVEY §8",
        "sf01_reference": full_path,
        "queries": rows,
        "calibration": brackets,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {len(rows)} queries, "
          f"max ratio {max(r['ratio'] for r in rows.values() if r['ratio']):.2f}")


if __name__ == "__main__":
    main()
