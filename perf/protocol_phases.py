"""Reconstruct the protocol's phase/wall-clock table from a run's
metrics.jsonl — the measurement the round-2 VERDICT had to do by hand
(weak #1: ~38 of 92 minutes were inter-experiment recompile/eval gaps).

Phases: diffusion (Phase A), generation+FID (gap between the last diffusion
record and the first classifier record), then per-experiment classifier
spans with the *gap before* each (compile/eval time not covered by epoch
records).

Usage: python perf/protocol_phases.py <metrics.jsonl> [<classifier metrics.jsonl>]
(The classifier phase logs into <project>_classifier/metrics.jsonl when the
orchestrator's clf_cfg renames the project; pass both files if split.)
"""

import json
import sys


def load(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            rows.extend(json.loads(ln) for ln in f)
    rows.sort(key=lambda r: r.get("ts", 0))
    return rows


def main():
    rows = load(sys.argv[1:])
    t0 = rows[0]["ts"]

    def key_rows(pred):
        return [r for r in rows if pred(r)]

    diff = key_rows(lambda r: any("diffusion_model" in k for k in r))
    exps = {}
    for r in rows:
        for k in r:
            if k.startswith("resnet_exp") and "train_loss" in k:
                exps.setdefault(k.split()[0], []).append(r)
    test_marks = key_rows(lambda r: any(k.endswith("test_f1") for k in r))

    out = []
    if diff:
        out.append(("Phase A diffusion",
                    diff[0]["ts"] - t0, diff[-1]["ts"] - t0,
                    len(diff), None))
    prev_end = diff[-1]["ts"] if diff else t0
    for name in sorted(exps):
        rs = exps[name]
        gap = rs[0]["ts"] - prev_end
        out.append((name, rs[0]["ts"] - t0, rs[-1]["ts"] - t0, len(rs), gap))
        # the test-eval record for this exp, if later than last epoch
        marks = [m for m in test_marks
                 if any(k.startswith(name.replace("resnet_", ""))
                        for k in m)]
        prev_end = max([rs[-1]["ts"]] + [m["ts"] for m in marks])
    total = rows[-1]["ts"] - t0
    print(f"{'phase':22s} {'start':>8s} {'end':>8s} {'span':>8s} "
          f"{'epochs':>6s} {'gap-before':>10s}")
    for name, s, e, n, gap in out:
        print(f"{name:22s} {s/60:7.1f}m {e/60:7.1f}m {(e-s)/60:7.1f}m "
              f"{n:6d} {('%7.1fm' % (gap/60)) if gap is not None else '      -'}")
    print(f"total wall (first->last record): {total/60:.1f} min")
    gaps = [g for *_, g in out if g is not None]
    if gaps:
        print(f"sum of inter-phase gaps: {sum(gaps)/60:.1f} min "
              f"(round-2 baseline: ~38 min)")


if __name__ == "__main__":
    main()
