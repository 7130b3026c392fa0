"""Capture a jax.profiler trace of the warm 30-iteration engine run and
print the top device ops by total duration."""
import dataclasses
import glob
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.ghicp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from bench import make_bench_pair  # noqa: E402
from ghicp_tpu.core.config import (CorrespondenceType, FeatureType,  # noqa
                                   GHICPConfig)
from ghicp_tpu.registration.pipeline import register_pair  # noqa: E402


def main():
    budget, phases, fused = (int(x) for x in sys.argv[1].split(","))
    src, tgt, _ = make_bench_pair()
    cfg = GHICPConfig(feature=FeatureType.BSC,
                      correspondence=CorrespondenceType.KM,
                      voxel_size=0.1, neighborhood_radius=0.5,
                      non_max_radius=0.5, min_neighbors=15,
                      bsc_neighbor_k=256, pca_cell_cap=40,
                      pca_max_cells=65536, estimated_overlap=0.8,
                      coarse_init="none", converge_translation=0.0,
                      converge_rotation=0.0, max_iterations=30,
                      auction_max_rounds=budget, auction_phases=phases,
                      fused_cost_kernel=bool(fused))
    register_pair(src, tgt, cfg)  # compile + warm
    tdir = "/tmp/ghicp_trace"
    out = register_pair(src, tgt, cfg, profile_dir=tdir)
    print("register:", out.timings["register"], flush=True)

    # Parse the xplane proto
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    files = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
    print("trace files:", files[-1:])
    data, _ = rtd.xspace_to_tool_data([files[-1]], "op_profile", {})
    import json
    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        name = node.get("name", "")
        t = m.get("rawTime", 0)
        out.append((t, name, depth))
        for c in node.get("children", []):
            walk(c, depth + 1, out)

    rows = []
    walk(prof.get("byProgram", prof.get("byCategory", {})), out=rows)
    rows.sort(reverse=True)
    for t, name, d in rows[:60]:
        print(f"{t/1e9:10.4f}s d{d} {name[:110]}")


if __name__ == "__main__":
    main()
