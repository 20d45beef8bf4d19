"""Top individual ops (ungrouped, full metadata) from an xplane trace.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_top_events.py '<glob>' [iters] [name-filter-regex]
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main() -> None:
    pattern = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    filt = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    path = sorted(glob.glob(pattern))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    plane = next(p for p in xs.planes if p.name.startswith("/device:"))
    emeta = {m.id: m for m in plane.event_metadata.values()}
    smeta = {m.id: m.name for m in plane.stat_metadata.values()}

    for line in plane.lines:
        tot = collections.Counter()
        cnt = collections.Counter()
        extra = {}
        for ev in line.events:
            m = emeta.get(ev.metadata_id)
            name = m.name if m else str(ev.metadata_id)
            if filt and not filt.search(name):
                continue
            tot[name] += ev.duration_ps
            cnt[name] += 1
            if name not in extra:
                stats = {}
                for st in ev.stats:
                    k = smeta.get(st.metadata_id, str(st.metadata_id))
                    v = st.str_value or st.int64_value or st.double_value
                    if st.ref_value:
                        v = smeta.get(st.ref_value, v)
                    stats[k] = v
                extra[name] = stats
        if not tot:
            continue
        print(f"=== line {line.name!r} (filtered) ===")
        for name, ps in tot.most_common(25):
            st = extra.get(name, {})
            desc = str(st.get("hlo_op", st))[:220]
            print(f"  {ps/1e12*1e3/iters:9.4f} ms/iter x{cnt[name]//iters:<4d} {name[:60]}")
            if desc and desc != "{}":
                print(f"            {desc}")


if __name__ == "__main__":
    main()
