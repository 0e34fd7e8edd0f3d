"""Timeline-aware xplane analysis: busy vs gap time on the TPU op line.

parse_trace.py sums durations per fusion name — fine for sync ops, but
async copy/slice start-done pairs report their whole in-flight window and
double count. Here:
  1. union busy time of SYNC events (excludes *-start/*-done) over the line
  2. top sync ops by total self time
  3. async-window totals reported separately (overlap-prone, upper bound)
"""

import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

ASYNC = ("copy-start", "copy-done", "slice-start", "slice-done",
         "all-reduce-start", "all-reduce-done", "fusion-start",
         "fusion-done")


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    path = sorted(glob.glob(f"{pat}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())

    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        ev_meta = {m.id: m.name for m in p.event_metadata.values()}
        for line in p.lines:
            if "XLA Ops" not in line.name:
                continue
            sync_iv = []
            agg = defaultdict(float)
            cnt = defaultdict(int)
            async_agg = defaultdict(float)
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                m = re.match(r"%([a-zA-Z0-9_.-]+)\s*=?\s*(\S*)", name)
                base = m.group(1) if m else name[:40]
                kind = base.split(".")[0]
                dur = ev.duration_ps / 1e12
                if kind in ASYNC:
                    async_agg[kind] += dur
                    continue
                shape = (m.group(2) if m else "")[:26]
                agg[f"{kind} {shape}"] += dur
                cnt[f"{kind} {shape}"] += 1
                t0 = ev.offset_ps / 1e12
                sync_iv.append((t0, t0 + dur))
            if not sync_iv:
                continue
            sync_iv.sort()
            busy = 0.0
            cur_s, cur_e = sync_iv[0]
            for s, e in sync_iv[1:]:
                if s > cur_e:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            busy += cur_e - cur_s
            span = sync_iv[-1][1] - sync_iv[0][0]
            print(f"== {p.name} / {line.name}")
            print(f"span {span*1e3:.1f} ms, sync busy {busy*1e3:.1f} ms, "
                  f"gap {100*(1-busy/max(span,1e-12)):.1f}%")
            for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
                print(f"{dur*1e3:9.2f} ms x{cnt[name]:<6d} {name}")
            print("-- async windows (overlapping, upper bounds):")
            for name, dur in sorted(async_agg.items(), key=lambda kv: -kv[1]):
                print(f"{dur*1e3:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
