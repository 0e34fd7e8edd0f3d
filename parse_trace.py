"""Aggregate XLA op time per fusion name from a jax.profiler xplane trace."""

import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    path = sorted(glob.glob(f"{pat}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())

    for p in xs.planes:
        if "TPU" not in p.name and "tpu" not in p.name.lower():
            continue
        ev_meta = {m.id: m.name for m in p.event_metadata.values()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        total = 0.0
        for line in p.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                agg[name] += dur
                cnt[name] += 1
                total += dur
        if not agg:
            continue
        print(f"== plane {p.name}: total op time {total*1e3:.2f} ms")
        items = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
        for name, dur in items:
            print(f"{dur*1e3:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
