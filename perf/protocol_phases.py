"""Reconstruct per-phase wall-clock for a reference-protocol run (VERDICT item 8).

Reads the run's metrics.jsonl (every record carries ``ts``), sorts by time, and
splits the stream into contiguous phases (a new phase starts whenever the
record's metric prefix changes).  Gaps between phases (compile + untimed work
such as sample generation) are attributed to the phase that follows them.
Prints a markdown table for RESULTS.md.

Usage: python perf/protocol_phases.py <metrics.jsonl> [process_start_unix_ts]
"""
import json
import sys


def phase_of(r):
    for k in r:
        if k.startswith("resnet_exp"):
            return k.split()[0]
        if k.startswith("diffusion_model"):
            return "diffusion_train"
        if k.startswith("fid_pixel"):
            return "generation + pixel FID"
        if k.startswith("fid_classifier"):
            return "classifier-feature FID"
        if k.startswith("exp") and "test_f1" in k:
            return k.split()[0] + " test eval"
    return None


def main(path, start_ts=None):
    recs = sorted((json.loads(l) for l in open(path)), key=lambda r: r["ts"])
    segs = []  # (name, first_ts, last_ts) contiguous
    for r in recs:
        p = phase_of(r)
        if p is None:
            continue
        if segs and segs[-1][0] == p:
            segs[-1][2] = r["ts"]
        else:
            segs.append([p, r["ts"], r["ts"]])

    t0 = start_ts if start_ts is not None else recs[0]["ts"]
    print("| phase | ends at (min) | duration (min) |")
    print("|---|---|---|")
    prev_end = t0
    for name, s, e in segs:
        dur = e - prev_end  # gap before the phase belongs to its compile/setup
        print(f"| {name} | {(e - t0)/60:.1f} | {dur/60:.1f} |")
        prev_end = e
    print(f"| **total** | {(prev_end - t0)/60:.1f} | |")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else None)
