"""Summarize a JAX profiler trace (xplane.pb) without the broken
tensorboard_plugin_profile converter: parse the XSpace proto directly via
tensorflow.tsl's generated bindings and aggregate device-side op time.

Usage: python tools/xprof_summary.py /tmp/nvtrace_falcon [top_n]
"""

import glob
import sys
from collections import defaultdict


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_summary(xs, top_n: int = 40):
    """Aggregate (total_us, count) per event name over device planes
    (TPU/GPU '/device:...' planes; host threads are skipped)."""
    rows = []
    for plane in xs.planes:
        name = plane.name
        if not ("TPU" in name or "GPU" in name or name.startswith("/device:")):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = defaultdict(lambda: [0, 0.0])
        line_names = []
        for line in plane.lines:
            line_names.append(line.name)
            # XLA op detail lines double-count the step line; keep the
            # per-op lines ("XLA Ops"/"XLA Modules" naming varies) and
            # skip obvious aggregates.
            if line.name in ("Steps", "Framework Ops", "Framework Name Scope"):
                continue
            for ev in line.events:
                nm = meta.get(ev.metadata_id, str(ev.metadata_id))
                a = agg[(line.name, nm)]
                a[0] += 1
                a[1] += ev.duration_ps / 1e6  # ps -> us
        rows.append((name, line_names, agg))
    return rows


def op_class_summary(xs, top_n: int = 25):
    """Aggregate device time by OP CLASS (fusion kinds collapsed,
    closed_calls split by output shape) — the view that decomposed the
    Falcon decode step in r4 (docs/PERFORMANCE.md)."""
    import re

    for plane in xs.planes:
        if not ("TPU" in plane.name or plane.name.startswith("/device:")):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(lambda: [0, 0.0])
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                m = re.match(r"%([a-zA-Z\-_]+)", name)
                cls = m.group(1) if m else name[:30]
                if cls == "closed_call":
                    m2 = re.search(r"= (\S+?)\[([\d,]+)\]", name)
                    cls = f"closed_call[{m2.group(2)}]" if m2 else cls
                if cls == "while":
                    continue  # inclusive of everything inside
                agg[cls][0] += 1
                agg[cls][1] += ev.duration_ps / 1e6
            tot = sum(v[1] for v in agg.values())
            print(f"== plane {plane.name}: {tot/1000:.1f}ms device time (excl. while)")
            for cls, (n, us) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:top_n]:
                print(f"  {us/1000:8.2f}ms  n={n:6d}  {cls}")


def main():
    args = [a for a in sys.argv[1:] if a != "--by-class"]
    trace_dir = args[0] if args else "/tmp/nvtrace_falcon"
    top_n = int(args[1]) if len(args) > 1 else 40
    xs = load_xspace(trace_dir)
    if "--by-class" in sys.argv:
        op_class_summary(xs, top_n)
        return
    for pname, line_names, agg in device_op_summary(xs):
        print(f"== plane: {pname} | lines: {line_names}")
        by_line = defaultdict(list)
        for (ln, nm), (c, us) in agg.items():
            by_line[ln].append((us, c, nm))
        for ln, items in by_line.items():
            tot = sum(us for us, _, _ in items)
            print(f"-- line '{ln}': total {tot:.0f}us, {len(items)} distinct ops")
            for us, c, nm in sorted(items, reverse=True)[:top_n]:
                print(f"   {us:12.0f}us x{c:6d}  {nm[:120]}")


if __name__ == "__main__":
    main()
