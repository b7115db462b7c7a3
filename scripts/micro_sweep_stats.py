"""Sweep demand-walk statistics: how many supers does a block visit?

ARCHITECTURE §7e attributes the honest mesh-traversal cost to the dense
per-(ray, entered-super) epilogue. This probe measures the other factor
— supers visited per block (the kernel's collect_stats counter) — for
REAL camera rays on the 1M-tri heightfield and the 88k-tri caustic
mesh, to say whether the next fix is pair-count (early-out /
granularity) or per-pair cost (kernel arithmetic).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-axon")


def probe(tag, scene, camera, out):
    from trace_tpu.sampler import uniform as U

    acc = scene.accel
    acc.collect_stats = True
    acc._last_steps = []
    n = 16384
    xs = np.stack([np.arange(n, dtype=np.int32) % 256 + 1,
                   np.arange(n, dtype=np.int32) // 256 + 1], -1)
    pf, ul, ut = U.get_camera_samples(jax.random.key(1), jnp.asarray(xs))
    rd, _ = camera.generate_ray_differentials(pf, ul, ut)
    _ = acc.closest(scene, rd.o, rd.d,
                    jnp.full((n,), jnp.inf, jnp.float32))
    steps = float(sum(int(jnp.sum(s)) for s in acc._last_steps))
    nb = -(-n // acc.block_rays)
    out[tag] = {
        "n_supers": int(acc.tables.n_supers),
        "blocks": nb,
        "avg_steps_per_block": round(steps / max(nb, 1), 1),
        "visit_frac": round(steps / max(nb, 1)
                            / max(int(acc.tables.n_supers), 1), 4),
    }
    acc.collect_stats = False
    print(json.dumps(out), flush=True)


def main():
    out = {}
    from trace_tpu.models.mesh_heavy import build_scene as mh_scene
    from trace_tpu.models.mesh_heavy import build_camera as mh_cam
    scene = mh_scene()
    probe("mesh1m_camera", scene, mh_cam(resolution=256,
                                         filename="/tmp/ms.png"), out)

    from trace_tpu.models.caustic_glass import build_scene as cg_scene
    from trace_tpu.models.caustic_glass import build_camera as cg_cam
    sc2 = cg_scene()
    if sc2.accel is not None and hasattr(sc2.accel, "collect_stats"):
        probe("caustic88k_camera", sc2,
              cg_cam(resolution=256, filename="/tmp/cs.png"), out)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
