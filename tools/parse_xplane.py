#!/usr/bin/env python
"""Aggregate per-op durations from a JAX profiler trace (xplane.pb).

The axon TPU tunnel breaks most timing tools (CLAUDE.md "Measuring
performance"), but ``jax.profiler.trace`` works; this script turns its
``*.xplane.pb`` output into a per-op duration table — the workflow that
found every real bottleneck in this project.

No tensorflow/xprof dependency: the file is decoded with
``protoc --decode_raw`` and parsed by field number against the XSpace
schema (tsl/profiler/protobuf/xplane.proto, field numbers verified against
a decoded trace from this jax build):

    XSpace.planes=1 -> XPlane{name=2, lines=3, event_metadata=4}
    XLine{id=1, name=2, events=4} -> XEvent{metadata_id=1, offset_ps=2,
                                            duration_ps=3}
    XEventMetadata map entry{key=1, value=2} -> {id=1, name=2}

Usage:
    python tools/parse_xplane.py <trace_dir_or_xplane.pb> [--top 30]
            [--plane tpu] [--by-line]

``trace_dir`` may be the logdir passed to jax.profiler.trace (the newest
xplane.pb under plugins/profile/ inside is used).
"""

from __future__ import annotations

import argparse
import collections
import subprocess
import sys
from pathlib import Path


def find_xplane(path: Path) -> Path:
    if path.is_file():
        return path
    cands = sorted(path.rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime)
    if not cands:
        sys.exit(f"no *.xplane.pb under {path}")
    return cands[-1]


def decode_raw(pb: Path) -> str:
    out = subprocess.run(
        ["protoc", "--decode_raw"],
        stdin=open(pb, "rb"),
        capture_output=True,
        text=True,
    )
    if out.returncode:
        sys.exit(f"protoc --decode_raw failed: {out.stderr[:500]}")
    return out.stdout


class Node:
    """One message block of decode_raw output: fields -> list of scalars
    or child Nodes."""

    __slots__ = ("fields",)

    def __init__(self):
        self.fields = collections.defaultdict(list)


def parse_blocks(text: str) -> Node:
    """Parse decode_raw's indented `N { ... }` / `N: value` lines."""
    root = Node()
    stack = [root]
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line == "}":
            stack.pop()
            continue
        if line.endswith("{"):
            field = int(line[:-1].strip())
            child = Node()
            stack[-1].fields[field].append(child)
            stack.append(child)
            continue
        field_s, _, val = line.partition(":")
        try:
            field = int(field_s)
        except ValueError:
            continue
        val = val.strip()
        if val.startswith('"'):
            val = val[1:-1]
        else:
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
        stack[-1].fields[field].append(val)
    return root


def scalar(node: Node, field: int, default=None):
    vals = [v for v in node.fields.get(field, []) if not isinstance(v, Node)]
    return vals[0] if vals else default


def aggregate(root: Node, plane_filter: str | None, by_line: bool):
    """[(plane, line, op-name, total_ps, count)] over all XPlanes."""
    rows = []
    for plane in root.fields.get(1, []):
        if not isinstance(plane, Node):
            continue
        pname = str(scalar(plane, 2, ""))
        if plane_filter and plane_filter.lower() not in pname.lower():
            continue
        meta = {}
        for ent in plane.fields.get(4, []):
            if not isinstance(ent, Node):
                continue
            mid = scalar(ent, 1)
            m = ent.fields.get(2, [None])[0]
            if isinstance(m, Node):
                meta[mid] = str(scalar(m, 2, mid))
        per = collections.defaultdict(lambda: [0, 0])
        for line in plane.fields.get(3, []):
            if not isinstance(line, Node):
                continue
            lname = str(scalar(line, 2, "")) if by_line else ""
            for ev in line.fields.get(4, []):
                if not isinstance(ev, Node):
                    continue
                mid = scalar(ev, 1)
                dur = scalar(ev, 3, 0) or 0
                key = (lname, meta.get(mid, f"meta:{mid}"))
                per[key][0] += int(dur)
                per[key][1] += 1
        for (lname, op), (tot, cnt) in per.items():
            rows.append((pname, lname, op, tot, cnt))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", type=Path)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default=None,
                    help="substring filter on plane name (e.g. 'tpu', 'host')")
    ap.add_argument("--by-line", action="store_true",
                    help="keep XLine (thread/stream) breakdown")
    args = ap.parse_args()
    pb = find_xplane(args.trace)
    print(f"# {pb}", file=sys.stderr)
    rows = aggregate(parse_blocks(decode_raw(pb)), args.plane, args.by_line)
    rows.sort(key=lambda r: -r[3])
    total = sum(r[3] for r in rows)
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for pname, lname, op, tot, cnt in rows[: args.top]:
        where = f" [{pname}{'/' + lname if lname else ''}]"
        print(f"{tot/1e9:10.3f} {100*tot/max(total,1):6.2f} {cnt:7d}  {op}{where}")
    print(f"{total/1e9:10.3f} {'100.0':>6}          TOTAL (sum of op durations)")


if __name__ == "__main__":
    main()
