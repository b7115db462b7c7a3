"""Perspective (projective, thin-lens) camera with fused batched ray-gen.

TPU-native counterpart of /root/reference/src/camera/camera.jl and
camera/perspective.jl. The projective transform chain
(screen<->raster<->camera, perspective.jl:11-41) is prebuilt on the host; ray
generation including depth-of-field and one-pixel-shift differentials
(camera.jl:48-65, perspective.jl:85-114) is one fused vectorized function
over a megabatch of film samples.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as m
from ..core import transform as T
from ..core.ray import RayDifferentials
from ..film.film import Film

F32 = jnp.float32


class PerspectiveCamera:
    def __init__(
        self,
        camera_to_world: T.Transform,
        screen_window=((-1.0, -1.0), (1.0, 1.0)),
        shutter_open: float = 0.0,
        shutter_close: float = 1.0,
        lens_radius: float = 0.0,
        focal_distance: float = 1e6,
        fov: float = 90.0,
        film: Film = None,  # required; keyword-positioned for API parity
        convention: str = "reference",
    ):
        """``convention``: "reference" replicates the Julia code's literal
        camera math (its transposed perspective matrix — pixel parity);
        "pbrt" uses the standard PBRT projection for well-framed output.
        """
        if film is None:
            raise ValueError(
                "PerspectiveCamera requires a Film (the raster transform "
                "chain is built from film.resolution)"
            )
        self.camera_to_world = camera_to_world
        self.shutter_open = float(shutter_open)
        self.shutter_close = float(shutter_close)
        self.lens_radius = float(lens_radius)
        self.focal_distance = float(focal_distance)
        self.film = film
        self.fov = float(fov)

        if convention == "pbrt":
            # The look_at convention (transformations.jl:105) has the
            # camera viewing down -z; PBRT's projection assumes +z, so
            # flip z into the projection.
            camera_to_screen = T.compose(
                T.perspective_pbrt(fov, 1e-2, 1000.0), T.scale(1.0, 1.0, -1.0)
            )
        else:
            camera_to_screen = T.perspective(fov, 1e-2, 1000.0)
        (sx0, sy0), (sx1, sy1) = screen_window
        rx, ry = film.resolution
        # PBRT flips y in the raster chain (1/(y0-y1)); the reference's
        # positive y scale is the source of its off-window "y band" quirk
        # — kept under the default convention for pixel parity.
        y_scale = (
            1.0 / (sy0 - sy1) if convention == "pbrt" else 1.0 / (sy1 - sy0)
        )
        # Under the reference convention the chain must use the Julia
        # code's wrong-order inverse composition (T.compose_ref,
        # transformations.jl:20-22): its raster_to_screen is the inv slot
        # of that product, whose translation column comes out scaled by
        # the raster diag — the effective screen window sits at ~[0,2)^2
        # for the stock (-1,-1)..(1,1) window, one full unit off the
        # mathematically-correct inverse. Verified numerically against
        # the literal Julia semantics; "pbrt" keeps true inverses.
        comp = T.compose if convention == "pbrt" else T.compose_ref
        screen_to_raster = comp(
            comp(
                T.scale(rx, ry, 1.0),
                T.scale(1.0 / (sx1 - sx0), y_scale, 1.0),
            ),
            T.translate([-sx0, -sy1, 0.0]),
        )
        self.raster_to_screen = T.inverse(screen_to_raster)
        self.screen_to_raster = screen_to_raster
        self.camera_to_screen = camera_to_screen
        self.raster_to_camera = comp(
            T.inverse(camera_to_screen), self.raster_to_screen
        )

        # Precomputed per-pixel camera-space shifts and lens-plane area
        # (perspective.jl:58-81). Host-side numpy: doing this on device and
        # reading scalars back would d2h at construction time, permanently
        # degrading the TPU relay's dispatch latency.
        r2c = np.asarray(self.raster_to_camera.m, np.float32)

        def apply_np(p):
            r = r2c[:3, :3] @ p + r2c[:3, 3]
            w = r2c[3, :3] @ p + r2c[3, 3]
            return r if w == 1.0 else r / w

        p_min = apply_np(np.zeros(3, np.float32))
        p_max = apply_np(np.array([rx, ry, 0.0], np.float32))
        self.dx_camera = apply_np(np.array([1.0, 0, 0], np.float32)) - p_min
        self.dy_camera = apply_np(np.array([0.0, 1, 0], np.float32)) - p_min
        pm = p_min[:2] / p_min[2] - p_max[:2] / p_max[2]
        self.A = float(abs(pm[0] * pm[1]))

    def _one_ray(self, p_film, u_lens):
        """Camera-space origin/direction for film points [N, 2]."""
        p_cam = T.apply_point(
            self.raster_to_camera,
            jnp.concatenate([p_film, jnp.zeros_like(p_film[..., :1])], axis=-1),
        )
        d = m.normalize(p_cam)
        o = jnp.zeros_like(d)
        if self.lens_radius > 0:
            p_lens = self.lens_radius * m.concentric_sample_disk(u_lens)
            # Camera-space rays travel toward -z (both conventions), so
            # the focal plane sits at z = -focal_distance: ft must be
            # focal_distance / -d.z. The reference divides by +d.z
            # (perspective.jl:99, PBRT's formula under PBRT's +z
            # convention), which flips every lens ray to point backwards
            # — a latent bug there (no reference scene sets
            # lens_radius > 0); fixed here, like ray.jl's ry_direction.
            ft = self.focal_distance / -d[..., 2]
            p_focus = d * ft[..., None]
            o = jnp.concatenate([p_lens, jnp.zeros_like(p_lens[..., :1])], axis=-1)
            d = m.normalize(p_focus - o)
        return o, d

    def generate_ray_differentials(self, p_film, u_lens, u_time):
        """Batched generate_ray_differential (camera.jl:48-65).

        p_film: [N, 2] 1-based raster coords; u_lens: [N, 2]; u_time: [N].
        Returns (RayDifferentials, weight[N]).
        """
        o_c, d_c = self._one_ray(p_film, u_lens)
        ox_c, dx_c = self._one_ray(p_film + jnp.asarray([1.0, 0.0], F32), u_lens)
        oy_c, dy_c = self._one_ray(p_film + jnp.asarray([0.0, 1.0], F32), u_lens)

        c2w = self.camera_to_world
        o_w = T.apply_point(c2w, o_c)
        d_w = m.normalize(T.apply_vec(c2w, d_c))
        time = m.lerp(
            jnp.asarray(self.shutter_open, F32),
            jnp.asarray(self.shutter_close, F32),
            u_time,
        )
        n = p_film.shape[0]
        rd = RayDifferentials(
            o=o_w,
            d=d_w,
            t_max=jnp.full((n,), jnp.inf, F32),
            time=time,
            has_differentials=jnp.ones((n,), bool),
            rx_origin=T.apply_point(c2w, ox_c),
            ry_origin=T.apply_point(c2w, oy_c),
            rx_direction=m.normalize(T.apply_vec(c2w, dx_c)),
            ry_direction=m.normalize(T.apply_vec(c2w, dy_c)),
        )
        return rd, jnp.ones((n,), F32)
