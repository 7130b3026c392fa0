"""Parse the latest captured xplane trace: top device ops by total time.

Manual xplane walk (the tensorboard profile plugin in this image is
version-mismatched with TF).  Sums event durations per event name on the
TPU device planes.
"""
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ghicp_trace"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
    print("trace:", files[-1])
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        per_line = {}
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            tl = 0
            for ev in line.events:
                dur = ev.duration_ps / 1e12
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[(line.name, name)][0] += dur
                agg[(line.name, name)][1] += 1
                tl += dur
            per_line[line.name] = tl
        print(f"== plane {plane.name}")
        for ln, t in sorted(per_line.items(), key=lambda kv: -kv[1]):
            print(f"   line {ln}: {t*1e3:.2f} ms total")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]
        for (ln, name), (t, n) in rows:
            print(f"{t*1e3:9.3f} ms  n={n:6d}  [{ln}] {name[:100]}")


if __name__ == "__main__":
    main()
