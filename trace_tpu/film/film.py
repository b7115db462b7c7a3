"""Film: deterministic segment-sum sample splatting.

TPU-native counterpart of /root/reference/src/film.jl. The reference
accumulates per-thread FilmTiles and merges them serially; here the film is a
functional ``FilmState`` pytree and ``add_samples`` scatters every sample's
whole filter footprint with one deterministic scatter-add — the TPU
replacement for tile merging (SURVEY.md §2 parallelism table).

Conventions kept pixel-compatible with the reference:
- continuous film coordinates are 1-based (crop bounds start at 1,
  film.jl:41-44), discrete pixel centers at p - 0.5;
- a 16x16 precomputed filter table indexed with ceil() offsets in x and
  floor() offsets in y (film.jl:147-154 — the reference's asymmetry,
  replicated for MSE parity);
- footprint pixel range [ceil(d - r), floor(d + r) + 1] inclusive
  (film.jl:140-143 — one pixel wider than PBRT, replicated);
- the saved image is flipped vertically (film.jl:221).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree
from ..core import spectrum as spec
from .filters import Filter, LanczosSincFilter

F32 = jnp.float32
FILTER_TABLE_WIDTH = 16


@pytree
class FilmState:
    xyz: jnp.ndarray          # [H, W, 3]
    weight_sum: jnp.ndarray   # [H, W]
    splat_xyz: jnp.ndarray    # [H, W, 3]


class Film:
    """Static film configuration (resolution, crop, filter table).

    crop window is in [0, 1]^2 like the reference Film ctor (film.jl:34-61).
    """

    def __init__(
        self,
        resolution,
        crop=((0.0, 0.0), (1.0, 1.0)),
        filter: Filter | None = None,
        diagonal: float = 35.0,
        scale: float = 1.0,
        filename: str = "out.png",
    ):
        self.resolution = (int(resolution[0]), int(resolution[1]))
        self.filter = filter or LanczosSincFilter((1.0, 1.0), 3.0)
        self.diagonal = float(diagonal) * 0.001
        self.scale = float(scale)
        self.filename = filename

        rx, ry = self.resolution
        # 1-based inclusive pixel bounds of the crop window (film.jl:41-44).
        self.crop_min = (
            int(math.ceil(rx * crop[0][0])) + 1,
            int(math.ceil(ry * crop[0][1])) + 1,
        )
        self.crop_max = (
            int(math.ceil(rx * crop[1][0])),
            int(math.ceil(ry * crop[1][1])),
        )
        self.width = self.crop_max[0] - self.crop_min[0] + 1
        self.height = self.crop_max[1] - self.crop_min[1] + 1

        # The reference precomputes a 16x16 filter table (film.jl:52-56);
        # add_samples instead evaluates the filter at the same quantized
        # points inline (identical values, no gather — see there).
        fr = self.filter.radius
        # Static per-axis footprint width: the reference loops
        # ceil(d-r)..floor(d+r)+1 inclusive, at most floor(2r)+2 pixels.
        self.fp_x = int(math.floor(2 * fr[0])) + 2
        self.fp_y = int(math.floor(2 * fr[1])) + 2
        # Static stencil offsets for the full-grid gather-free splat
        # (add_samples_grid): a sample at base pixel p (d - p in
        # [-0.5, 0.5)) touches pixels p + delta with delta in
        # [ceil(-0.5 - r), floor(0.5 + r) + 1].
        self.stencil_x = (int(math.ceil(-0.5 - fr[0])),
                          int(math.floor(0.5 + fr[0])) + 1)
        self.stencil_y = (int(math.ceil(-0.5 - fr[1])),
                          int(math.floor(0.5 + fr[1])) + 1)

    # -- sample bounds ------------------------------------------------------

    def sample_bounds(self):
        """Pixel range samplers must cover, padded by the filter radius
        (film.jl:68-73). Returns ((x0, y0), (x1, y1)) inclusive, 1-based."""
        fr = self.filter.radius
        lo = (
            int(math.floor(self.crop_min[0] + 0.5 - fr[0])),
            int(math.floor(self.crop_min[1] + 0.5 - fr[1])),
        )
        hi = (
            int(math.ceil(self.crop_max[0] - 0.5 + fr[0])),
            int(math.ceil(self.crop_max[1] - 0.5 + fr[1])),
        )
        return lo, hi

    def physical_extent(self):
        """(film.jl:79-84)."""
        aspect = self.resolution[1] / self.resolution[0]
        x = math.sqrt(self.diagonal**2 / (1 + aspect**2))
        y = aspect * x
        return ((-x / 2, -y / 2), (x / 2, y / 2))

    # -- state --------------------------------------------------------------

    def initial_state(self) -> FilmState:
        h, w = self.height, self.width
        return FilmState(
            jnp.zeros((h, w, 3), F32), jnp.zeros((h, w), F32), jnp.zeros((h, w, 3), F32)
        )

    def add_samples(self, state: FilmState, p_film, L_rgb, sample_weight,
                    valid=None) -> FilmState:
        """Scatter N samples over their filter footprints (film.jl:134-164).

        p_film: [N, 2] 1-based continuous film coords; L_rgb: [N, 3];
        sample_weight: [N]. ``valid`` ([N] bool, optional) disables lanes
        entirely — both the xyz contribution AND the filter weight_sum
        (sample_weight alone only scales xyz, reference semantics, so a
        padded lane with weight 0 would still dim its footprint's pixels
        through weight_sum).
        """
        d = p_film - 0.5
        r = jnp.asarray(self.filter.radius, F32)
        inv_r = 1.0 / r
        p0 = jnp.ceil(d - r)
        p1 = jnp.floor(d + r) + 1.0
        p0 = jnp.maximum(p0, jnp.asarray(
            [max(self.crop_min[0], 1), max(self.crop_min[1], 1)], F32))
        p1 = jnp.minimum(p1, jnp.asarray([self.crop_max[0], self.crop_max[1]], F32))

        xyz = spec.rgb_to_xyz(L_rgb) * sample_weight[..., None]

        # Static footprint offsets.
        ox = jnp.arange(self.fp_x, dtype=F32)
        oy = jnp.arange(self.fp_y, dtype=F32)
        px = p0[:, 0:1] + ox[None, :]                      # [N, fx]
        py = p0[:, 1:2] + oy[None, :]                      # [N, fy]
        in_x = px <= p1[:, 0:1]
        in_y = py <= p1[:, 1:2]

        fx = jnp.abs((px - d[:, 0:1]) * inv_r[0]) * FILTER_TABLE_WIDTH
        fy = jnp.abs((py - d[:, 1:2]) * inv_r[1]) * FILTER_TABLE_WIDTH
        off_x = jnp.clip(jnp.ceil(fx), 1, FILTER_TABLE_WIDTH).astype(jnp.int32) - 1
        off_y = jnp.clip(jnp.floor(fy), 1, FILTER_TABLE_WIDTH).astype(jnp.int32) - 1

        # Evaluate the filter directly at the quantized table points
        # instead of gathering from the 16x16 table: identical values
        # (the table itself is filter((i+0.5)*r/W)), but a fused VPU
        # expression instead of a per-lane 2D gather (2x faster measured,
        # and it keeps the whole splat in one XLA fusion).
        step_x = r[0] / FILTER_TABLE_WIDTH
        step_y = r[1] / FILTER_TABLE_WIDTH
        pts = jnp.stack(
            [
                jnp.broadcast_to(
                    (off_x.astype(F32) + 0.5)[:, None, :] * step_x,
                    (off_x.shape[0], self.fp_y, self.fp_x),
                ),
                jnp.broadcast_to(
                    (off_y.astype(F32) + 0.5)[:, :, None] * step_y,
                    (off_y.shape[0], self.fp_y, self.fp_x),
                ),
            ],
            axis=-1,
        )
        w = self.filter(pts)                                  # [N, fy, fx]
        mask = in_y[:, :, None] & in_x[:, None, :]
        if valid is not None:
            mask = mask & valid[:, None, None]
        w = w * mask.astype(F32)

        ix = (px - self.crop_min[0]).astype(jnp.int32)               # [N, fx]
        iy = (py - self.crop_min[1]).astype(jnp.int32)               # [N, fy]
        flat = (
            jnp.clip(iy, 0, self.height - 1)[:, :, None] * self.width
            + jnp.clip(ix, 0, self.width - 1)[:, None, :]
        ).reshape(-1)
        wf = w.reshape(-1)
        contrib = wf[:, None] * jnp.repeat(
            xyz[:, None, :], self.fp_x * self.fp_y, axis=1
        ).reshape(-1, 3)

        new_xyz = state.xyz.reshape(-1, 3).at[flat].add(contrib).reshape(state.xyz.shape)
        new_ws = (
            state.weight_sum.reshape(-1).at[flat].add(wf).reshape(state.weight_sum.shape)
        )
        return FilmState(new_xyz, new_ws, state.splat_xyz)

    def add_samples_grid(self, state: FilmState, p_film, L_rgb,
                         sample_weight, origin, grid_hw,
                         valid=None) -> FilmState:
        """Gather-free full-grid splat: same semantics as add_samples
        (incl. the reference's ceil/floor table asymmetry and
        one-wider footprint) for the case where the N lanes are the
        COMPLETE raster sample grid in x-fastest order (one jittered
        sample per sample-bounds pixel — what render() passes when a
        chunk covers the whole grid). The per-sample filter footprint
        then becomes a static stencil: for each pixel offset delta, the
        contribution image is the (weight x value) grid shifted by
        delta — a handful of static slice-adds, NO scatter. Measured on
        v5e at 258²: 34.6 ms scatter -> ~1 ms stencil per sample pass
        (scripts/micro_frame.py). Bit-differences vs add_samples are
        association-only (sum order within a pixel).

        origin: (x0, y0) of the lane grid (sample_bounds lo);
        grid_hw: (gh, gw) with N == gh * gw.
        """
        gh, gw = grid_hw
        x0, y0 = origin
        pf = jnp.moveaxis(p_film, -1, 0)
        d_x = (pf[0] - 0.5).reshape(gh, gw)
        d_y = (pf[1] - 0.5).reshape(gh, gw)
        r = self.filter.radius
        inv_rx = np.float32(1.0 / r[0])
        inv_ry = np.float32(1.0 / r[1])
        step_x = np.float32(r[0] / FILTER_TABLE_WIDTH)
        step_y = np.float32(r[1] / FILTER_TABLE_WIDTH)

        xyz = spec.rgb_to_xyz(L_rgb) * sample_weight[..., None]
        xc = jnp.moveaxis(xyz, -1, 0)
        vx = xc[0].reshape(gh, gw)
        vy = xc[1].reshape(gh, gw)
        vz = xc[2].reshape(gh, gw)
        vmask = (None if valid is None
                 else valid.reshape(gh, gw).astype(F32))

        # Footprint bounds per lane (same clamps as add_samples).
        p0x = jnp.maximum(jnp.ceil(d_x - r[0]),
                          np.float32(max(self.crop_min[0], 1)))
        p0y = jnp.maximum(jnp.ceil(d_y - r[1]),
                          np.float32(max(self.crop_min[1], 1)))
        p1x = jnp.minimum(jnp.floor(d_x + r[0]) + 1.0,
                          np.float32(self.crop_max[0]))
        p1y = jnp.minimum(jnp.floor(d_y + r[1]) + 1.0,
                          np.float32(self.crop_max[1]))

        # Base pixel coordinate of each lane (the grid raster coords).
        px = (jnp.arange(gw, dtype=F32) + np.float32(x0))[None, :]
        py = (jnp.arange(gh, dtype=F32) + np.float32(y0))[:, None]

        H, W = self.height, self.width
        sx = x0 - self.crop_min[0]
        sy = y0 - self.crop_min[1]
        acc = jnp.moveaxis(state.xyz, -1, 0)  # [3, H, W]
        acc_x, acc_y, acc_z = acc[0], acc[1], acc[2]
        acc_w = state.weight_sum

        for dy in range(self.stencil_y[0], self.stencil_y[1] + 1):
            # Static overlap of the shifted grid with the film.
            ty0 = max(0, dy + sy)
            ly = min(H, gh + dy + sy) - ty0
            if ly <= 0:
                continue
            gy0 = ty0 - (dy + sy)
            for dx in range(self.stencil_x[0], self.stencil_x[1] + 1):
                tx0 = max(0, dx + sx)
                lx = min(W, gw + dx + sx) - tx0
                if lx <= 0:
                    continue
                gx0 = tx0 - (dx + sx)
                qx = px + np.float32(dx)
                qy = py + np.float32(dy)
                inb = ((qx >= p0x) & (qx <= p1x)
                       & (qy >= p0y) & (qy <= p1y))
                fx = jnp.abs((qx - d_x) * inv_rx) * FILTER_TABLE_WIDTH
                fy = jnp.abs((qy - d_y) * inv_ry) * FILTER_TABLE_WIDTH
                off_x = jnp.clip(jnp.ceil(fx), 1,
                                 FILTER_TABLE_WIDTH).astype(jnp.int32) - 1
                off_y = jnp.clip(jnp.floor(fy), 1,
                                 FILTER_TABLE_WIDTH).astype(jnp.int32) - 1
                pts = jnp.stack(
                    [(off_x.astype(F32) + 0.5) * step_x,
                     (off_y.astype(F32) + 0.5) * step_y], axis=-1)
                w = self.filter(pts) * inb.astype(F32)
                if vmask is not None:
                    w = w * vmask
                ws = w[gy0:gy0 + ly, gx0:gx0 + lx]
                tyy = slice(ty0, ty0 + ly)
                txx = slice(tx0, tx0 + lx)
                acc_x = acc_x.at[tyy, txx].add(
                    ws * vx[gy0:gy0 + ly, gx0:gx0 + lx])
                acc_y = acc_y.at[tyy, txx].add(
                    ws * vy[gy0:gy0 + ly, gx0:gx0 + lx])
                acc_z = acc_z.at[tyy, txx].add(
                    ws * vz[gy0:gy0 + ly, gx0:gx0 + lx])
                acc_w = acc_w.at[tyy, txx].add(ws)

        new_xyz = jnp.moveaxis(jnp.stack([acc_x, acc_y, acc_z], 0), 0, -1)
        return FilmState(new_xyz, acc_w, state.splat_xyz)

    def add_splats(self, state: FilmState, p_film, L_rgb) -> FilmState:
        """Unfiltered splat additions at integer pixels. Splats outside
        the crop are dropped (PBRT AddSplat), not clamped onto the border.
        """
        ix = jnp.floor(p_film[:, 0]).astype(jnp.int32) - self.crop_min[0]
        iy = jnp.floor(p_film[:, 1]).astype(jnp.int32) - self.crop_min[1]
        inb = (
            (ix >= 0) & (ix < self.width) & (iy >= 0) & (iy < self.height)
        )
        flat = jnp.clip(iy, 0, self.height - 1) * self.width + jnp.clip(
            ix, 0, self.width - 1
        )
        # where (not multiply): a non-finite L on a dropped lane would
        # propagate NaN through *0 into the clamped in-crop index.
        xyz = jnp.where(inb[:, None], spec.rgb_to_xyz(L_rgb), 0.0)
        new_splat = (
            state.splat_xyz.reshape(-1, 3).at[flat].add(xyz).reshape(state.splat_xyz.shape)
        )
        return FilmState(state.xyz, state.weight_sum, new_splat)

    def set_image(self, rgb_image) -> FilmState:
        """Overwrite the film with a full image (SPPM path, film.jl:195-202)."""
        return FilmState(
            spec.rgb_to_xyz(rgb_image),
            jnp.ones((self.height, self.width), F32),
            jnp.zeros((self.height, self.width, 3), F32),
        )

    def to_image(self, state: FilmState, splat_scale: float = 1.0):
        """Weight-normalize, add splats, scale, clamp — the save() pipeline
        (film.jl:204-222) minus the disk write. Returns [H, W, 3] RGB,
        *not* vertically flipped (save_png flips)."""
        rgb = spec.xyz_to_rgb(state.xyz)
        inv_w = jnp.where(state.weight_sum != 0.0, 1.0 / state.weight_sum, 1.0)
        rgb = jnp.maximum(0.0, rgb * inv_w[..., None])
        rgb = rgb + splat_scale * spec.xyz_to_rgb(state.splat_xyz)
        rgb = rgb * self.scale
        return jnp.clip(rgb, 0.0, 1.0)

    def save_png(self, state: FilmState, path: str | None = None, splat_scale: float = 1.0):
        from ..io.png import write_png
        from ..utils.pytree import read_host

        img = read_host(self.to_image(state, splat_scale))
        write_png(path or self.filename, img[::-1])  # vertical flip (film.jl:221)
        return img
