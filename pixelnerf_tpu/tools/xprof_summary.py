"""Summarize an xprof/TensorBoard trace from the command line.

`tools/profile_step.py` writes an `.xplane.pb` trace; the TensorBoard
Profile UI is the intended viewer, but this environment's
tensorboard_plugin_profile native bridge is version-incompatible with the
installed TF, so this tool aggregates the XPlane proto directly: per-op
device-time totals from the `/device:TPU:*` (or CPU) plane's "XLA Ops"
line, bucketed into the framework's hot units (field-MLP Pallas kernel,
pyramid gather/scatter kernels, encoder convolutions, sort, transfers).

This is the auditable source of PERFORMANCE.md's where-the-time-goes
tables (the reference ships torch-profiler ranges but no reader either —
SURVEY §5 tracing).

Usage:
    python -m pixelnerf_tpu.tools.profile_step -c conf/exp/srn.conf --out /tmp/prof
    python -m pixelnerf_tpu.tools.xprof_summary --logdir /tmp/prof --top 15
"""

from __future__ import annotations

import argparse
import glob
import os
import re
from collections import defaultdict

# the plugin's fast proto path needs codegen newer than the env ships;
# the pure-python fallback parses the same wire format (slower, fine for
# trace-sized files). Must be set before any protobuf import.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# unit buckets: first matching pattern wins (order matters)
DEFAULT_BUCKETS = (
    ("field MLP kernel", r"(mlp_coarse|mlp_fine|resnetfc|fused_field|field_fused).*(_call_pallas|custom-call)|_call_pallas.*(mlp|resnetfc)"),
    ("pyramid gather/scatter kernels", r"(pyramid|gather|scatter|onehot|encoder_index).*(_call_pallas|custom-call)|_call_pallas"),
    ("encoder convolutions", r"convolution|conv_general"),
    ("sort", r"sort"),
    ("host/device transfers", r"copy-start|copy-done|infeed|outfeed|transfer"),
    ("dynamic slices (weight streaming)", r"slice-start|slice-done|dynamic-slice"),
    ("elementwise/fusion (sampling, compositing, Adam)", r"fusion|add|multiply|select|reduce|broadcast|exp|log|cumsum|iota|rng|bitcast|convert|compare|scatter\b"),
)


def load_xspaces(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    spaces = []
    for p in paths[-1:]:  # newest run directory only
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def summarize_plane(plane, line_name="XLA Ops"):
    """-> (total_ms, {op_name: ms}) for one device plane."""
    em = {m.id: m.name for m in plane.event_metadata.values()}
    per_op: dict = defaultdict(int)
    for line in plane.lines:
        if line.name != line_name:
            continue
        for e in line.events:
            per_op[em.get(e.metadata_id, "?")] += e.duration_ps
    total_ms = sum(per_op.values()) / 1e9
    return total_ms, {k: v / 1e9 for k, v in per_op.items()}


def bucketize(per_op, buckets=DEFAULT_BUCKETS):
    out = defaultdict(float)
    for name, ms in per_op.items():
        for label, pat in buckets:
            if re.search(pat, name, re.IGNORECASE):
                out[label] += ms
                break
        else:
            out["other"] += ms
    return dict(out)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", required=True)
    parser.add_argument("--top", type=int, default=12)
    parser.add_argument(
        "--steps", type=int, default=0,
        help="if set, also print per-step averages (trace captured N steps)",
    )
    args = parser.parse_args(argv)

    for path, xs in load_xspaces(args.logdir):
        print(f"# {path}")
        for plane in xs.planes:
            if not plane.name.startswith("/device:") or not plane.lines:
                continue
            if "CUSTOM" in plane.name:
                continue
            total_ms, per_op = summarize_plane(plane)
            if total_ms == 0:
                continue
            print(f"\n== {plane.name}: {total_ms:.2f} ms total XLA-op time ==")
            if args.steps:
                print(f"   per step ({args.steps}): {total_ms/args.steps:.2f} ms")
            den = args.steps or 1
            unit = "ms/step" if args.steps else "ms"
            print(f"-- buckets ({unit}, % of device time) --")
            for label, ms in sorted(bucketize(per_op).items(), key=lambda kv: -kv[1]):
                print(f"{ms/den:10.3f} {unit}  {100*ms/total_ms:5.1f}%  {label}")
            print(f"-- top {args.top} ops ({unit}) --")
            for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
                print(f"{ms/den:10.3f} {unit}  {name[:100]}")


if __name__ == "__main__":
    main()
