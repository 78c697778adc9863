"""Emit benchmarks/SCALE_MODEL.json: per-device memory feasibility of
the 10^8-unknown advection-diffusion config (BASELINE.json config 5) on
8/16/32-device meshes, from the shape model in
``pyamg_tpu/parallel/scale_model.py`` (validated against built
hierarchies in tests/test_dist_setup.py).
"""

import json

from pyamg_tpu.parallel.scale_model import summarize


def main():
    n = 10_000**2                    # 10^8 unknowns, 2D grid ordering
    W = 5                            # upwind advection-diffusion stencil
    out = {
        "metric": "dist_memory_model_1e8",
        "config": ("advection-diffusion 10^8 unknowns (1e4 x 1e4 grid), "
                   "W=5 upwind stencil, f32 storage, distributed SA "
                   "(K=1) with 5 levels"),
        "model": ("exact static shape laws of distributed_sa_setup "
                  "(width caps, c_cap blocks, (rounds+1)*g transfer "
                  "margins); coarse-level margin fractions from the "
                  "measured 2M artifact DIST_SCALE.json"),
        "hbm_per_chip_gb": 16.0,     # v5e
        "meshes": [summarize(n, W, d, levels=5, hbm_bytes=16e9)
                   for d in (8, 16, 32)],
        "notes": [
            "setup_peak is the transient during one _level_step (the "
            "gP-extended P/AP arrays); levels build one at a time so "
            "peaks do not stack",
            "margins on levels >=2 reach ~n_loc (whole-neighbour-block "
            "relays): the ring exchange degenerates to near-all-gather "
            "at depth, which is the flagged comm-efficiency frontier, "
            "not a memory problem",
        ],
    }
    print(json.dumps({k: v for k, v in out.items() if k != "meshes"}))
    for m in out["meshes"]:
        print(json.dumps({k: v for k, v in m.items()
                          if k != "per_level"}))
    with open("benchmarks/SCALE_MODEL.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
