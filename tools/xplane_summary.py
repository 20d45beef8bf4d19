"""Summarize a jax.profiler xplane.pb: per-op device time on the TPU plane.

The tensorboard profile plugin's converter is broken in this image (TF
version mismatch), but the raw trace is intact — this parses it directly.

Usage:
    # capture
    with jax.profiler.trace("/tmp/jax_trace"):
        for _ in range(30): out = f(x)
        np.asarray(out)
    # summarize (pure-python protobuf needed for the TF proto)
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_summary.py '/tmp/jax_trace/plugins/profile/*/[!.]*.xplane.pb' [iters]

Prints, per trace line (XLA Modules / XLA Ops / Async XLA Ops), total device
time and the top ops grouped by name (fusion indices stripped), normalized
per iteration.
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main() -> None:
    pattern = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace/plugins/profile/*/*.xplane.pb"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path = sorted(glob.glob(pattern))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    plane = next((p for p in xs.planes if p.name.startswith("/device:")), None)
    if plane is None:
        raise SystemExit(f"no device plane in {path}; planes: {[p.name for p in xs.planes]}")
    emeta = {m.id: m.name for m in plane.event_metadata.values()}

    for line in plane.lines:
        tot = collections.Counter()
        cnt = collections.Counter()
        for ev in line.events:
            name = emeta.get(ev.metadata_id, str(ev.metadata_id))
            g = re.sub(r"\.\d+\b", "", name.split("=")[0].strip())
            tot[g] += ev.duration_ps
            cnt[g] += 1
        if not tot:
            continue
        print(f"=== line {line.name!r}: total={sum(tot.values())/1e12*1e3:.3f} ms "
              f"over {sum(cnt.values())} events")
        for g, ps in tot.most_common(40):
            print(f"  {ps/1e12*1e3/iters:9.4f} ms/iter  x{cnt[g]:<5d} {g[:100]}")


if __name__ == "__main__":
    main()
