"""Procedural terrain: heightfield generation (host, numpy) + device-side
height lookup.

TPU-native replacement for the reference's trimesh terrain
(`add_triangle_mesh` + `Terrain` classes at
`/root/reference/isaacgymenvs/tasks/anymal_terrain.py:541-671` and the Perlin
`Terrain` at `tasks/gogoro_new.py:734-790`): instead of a triangle-mesh BVH,
the ground is a heightfield sampled with bilinear interpolation inside the
contact kernel (`ground_height_fn` hook of `ops/sim.build_step_fn`) — a
TPU-friendly O(1) gather per contact candidate.

Terrain types mirror `anymal_terrain.py`'s curriculum grid: pyramid slopes,
stairs, discrete obstacles, random uniform noise, plus Perlin octaves for the
Gogoro variant. Rows = difficulty levels (curriculum), columns = terrain
types (`anymal_terrain.py:617-671`).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Heightfield:
    """A (H, W) height grid with world-space scaling."""

    def __init__(self, heights: np.ndarray, horizontal_scale: float,
                 vertical_scale: float = 1.0, origin=(0.0, 0.0)):
        self.heights = heights.astype(np.float32)
        self.h_scale = float(horizontal_scale)
        self.v_scale = float(vertical_scale)
        self.origin = np.asarray(origin, np.float32)

    def height_fn(self):
        """Returns ground_height_fn(x, y) -> z for the contact kernel
        (bilinear; parity with `get_heights`, anymal_terrain.py:513-536)."""
        table = jnp.asarray(self.heights * self.v_scale)
        H, W = self.heights.shape
        hs = self.h_scale
        ox, oy = float(self.origin[0]), float(self.origin[1])

        def fn(x, y):
            gx = (x - ox) / hs
            gy = (y - oy) / hs
            i0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, H - 2)
            j0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, W - 2)
            fx = jnp.clip(gx - i0, 0.0, 1.0)
            fy = jnp.clip(gy - j0, 0.0, 1.0)
            h00 = table[i0, j0]
            h10 = table[i0 + 1, j0]
            h01 = table[i0, j0 + 1]
            h11 = table[i0 + 1, j0 + 1]
            return (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                    + h01 * (1 - fx) * fy + h11 * fx * fy)

        return fn

    def height_and_grad_fn(self):
        """Returns fn(x, y) -> (z, dz/dx, dz/dy): bilinear height plus the
        EXACT within-cell gradient of the bilinear patch (piecewise linear
        in the other coordinate, discontinuous only across cell edges).
        Used by both contact backends for sloped-terrain contact normals:
        the XLA path per substep (ops/contact.py) and the fused kernel's
        per-control-step local-plane rows (ops/fused._ground_plane_sampler),
        so the two paths sample the identical surface model."""
        table = jnp.asarray(self.heights * self.v_scale)
        H, W = self.heights.shape
        hs = self.h_scale
        ox, oy = float(self.origin[0]), float(self.origin[1])

        def fn(x, y):
            gx = (x - ox) / hs
            gy = (y - oy) / hs
            i0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, H - 2)
            j0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, W - 2)
            fx = jnp.clip(gx - i0, 0.0, 1.0)
            fy = jnp.clip(gy - j0, 0.0, 1.0)
            h00 = table[i0, j0]
            h10 = table[i0 + 1, j0]
            h01 = table[i0, j0 + 1]
            h11 = table[i0 + 1, j0 + 1]
            z = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                 + h01 * (1 - fx) * fy + h11 * fx * fy)
            dzdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / hs
            dzdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / hs
            return z, dzdx, dzdy

        return fn

    def clustered_fn(self, patch_cells: int = 32, grad: bool = False):
        """Bilinear sampler for per-env CLUSTERED query points, as
        elementwise math + two batched matmuls — no gather in the hot loop.

        XLA on TPU lowers a plain `table[i, j]` gather placed inside a
        `while` loop (every training/bench step lives in one) to a scoped-
        memory serial fusion: measured 23.7 ms for 4096x140 points on a v5e
        where the identical gather OUTSIDE a loop takes 1.4 ms. This
        formulation instead slices one (P, P) patch per env around its
        query cluster (vmapped dynamic_slice) and evaluates the bilinear
        surface as z = U @ patch @ V with per-point hat-basis weight
        vectors U, V — identical values to `height_fn` (the hat basis IS
        bilinear interpolation), 6x faster in-loop, and MXU-shaped.

        Constraint: each env's points must span < (patch_cells - 2) cells
        per axis; wider spreads clamp to the patch edge. Returns
        fn(x (B, K), y (B, K)) -> z (B, K), or (z, dz/dx, dz/dy) when
        grad=True (the gradient basis dU is the hat derivative, piecewise
        constant — the exact within-cell bilinear gradient)."""
        import jax

        table = jnp.asarray(self.heights * self.v_scale)
        H, W = self.heights.shape
        hs = self.h_scale
        ox, oy = float(self.origin[0]), float(self.origin[1])
        P = min(int(patch_cells), H, W)

        def fn(x, y):
            gx = (x - ox) / hs
            gy = (y - oy) / hs
            ax = jnp.clip(jnp.floor(gx.min(axis=1)).astype(jnp.int32) - 1,
                          0, H - P)
            ay = jnp.clip(jnp.floor(gy.min(axis=1)).astype(jnp.int32) - 1,
                          0, W - P)
            patch = jax.vmap(
                lambda i, j: jax.lax.dynamic_slice(table, (i, j), (P, P))
            )(ax, ay)                                        # (B, P, P)
            lx = jnp.clip(gx - ax[:, None], 0.0, P - 1.001)
            ly = jnp.clip(gy - ay[:, None], 0.0, P - 1.001)
            ar = jnp.arange(P, dtype=jnp.float32)
            U = jnp.maximum(0.0, 1.0 - jnp.abs(lx[..., None] - ar))
            V = jnp.maximum(0.0, 1.0 - jnp.abs(ly[..., None] - ar))
            z = jnp.einsum('bpi,bij,bpj->bp', U, patch, V)
            if not grad:
                return z
            # derivative basis with the same floor() cell convention as
            # height_and_grad_fn: for lx in [i, i+1), dz/dlx uses rows
            # i, i+1 — expressed as dU = 1[ar == i+1] - 1[ar == i]
            # (a sign() hat-derivative would vanish at exact grid points)
            i0x = jnp.clip(jnp.floor(lx), 0, P - 2)[..., None]
            i0y = jnp.clip(jnp.floor(ly), 0, P - 2)[..., None]
            dU = (ar == i0x + 1).astype(jnp.float32) \
                - (ar == i0x).astype(jnp.float32)
            dV = (ar == i0y + 1).astype(jnp.float32) \
                - (ar == i0y).astype(jnp.float32)
            dzdx = jnp.einsum('bpi,bij,bpj->bp', dU, patch, V) / hs
            dzdy = jnp.einsum('bpi,bij,bpj->bp', U, patch, dV) / hs
            return z, dzdx, dzdy

        return fn


# ---------------------------------------------------------------------------
# sub-terrain generators (numpy; parity with isaacgym.terrain_utils usage)
# ---------------------------------------------------------------------------

def random_uniform_terrain(shape, min_h, max_h, step, rng):
    levels = np.arange(min_h, max_h + step, step)
    return rng.choice(levels, size=shape).astype(np.float32)


def sloped_terrain(shape, slope):
    """Linear slope along x; slope in height-units per cell."""
    i = np.arange(shape[0])[:, None]
    return np.broadcast_to(i * slope, shape).astype(np.float32)


def pyramid_sloped_terrain(shape, slope):
    """Pyramid: peak (or pit, slope<0) at center (anymal_terrain.py:625)."""
    H, W = shape
    i = np.abs(np.arange(H)[:, None] - H // 2)
    j = np.abs(np.arange(W)[None, :] - W // 2)
    d = np.maximum(i, j)
    return ((d.max() - d) * slope).astype(np.float32)


def pyramid_stairs_terrain(shape, step_width_cells, step_height):
    H, W = shape
    i = np.abs(np.arange(H)[:, None] - H // 2)
    j = np.abs(np.arange(W)[None, :] - W // 2)
    d = np.maximum(i, j)
    ring = (d.max() - d) // step_width_cells
    return (ring * step_height).astype(np.float32)


def discrete_obstacles_terrain(shape, max_height, min_size, max_size, num_rects, rng):
    hf = np.zeros(shape, np.float32)
    for _ in range(num_rects):
        w = rng.randint(min_size, max_size + 1)
        h = rng.randint(min_size, max_size + 1)
        i = rng.randint(0, max(1, shape[0] - w))
        j = rng.randint(0, max(1, shape[1] - h))
        hf[i:i + w, j:j + h] = rng.uniform(-max_height, max_height)
    return hf


def stepping_stones_terrain(shape, stone_size, stone_distance, max_height, depth, rng):
    hf = np.full(shape, depth, np.float32)
    pitch = stone_size + stone_distance
    for i0 in range(0, shape[0], pitch):
        for j0 in range(0, shape[1], pitch):
            hf[i0:i0 + stone_size, j0:j0 + stone_size] = rng.uniform(0, max_height)
    return hf


def perlin_terrain(shape, res=(2, 8), octaves=2, persistence=0.5, rng=None):
    """Perlin octaves — parity with gogoro_new.py:764-790 (rand_perlin_2d)."""
    rng = rng or np.random.RandomState(0)
    out = np.zeros(shape, np.float32)
    frequency, amplitude = 2, 1.0
    for _ in range(octaves):
        out += amplitude * _perlin(shape, (frequency * res[0], frequency * res[1]), rng)
        frequency *= 2
        amplitude *= persistence
    return out


def _perlin(shape, res, rng):
    d0, d1 = shape[0] // res[0], shape[1] // res[1]
    angles = 2 * np.pi * rng.rand(res[0] + 1, res[1] + 1)
    grads = np.stack([np.cos(angles), np.sin(angles)], -1)
    gy, gx = np.meshgrid(np.arange(shape[1]) / d1 % 1, np.arange(shape[0]) / d0 % 1)
    grid = np.stack([gx, gy], -1)

    def g(di, dj):
        gg = grads[di:di + res[0], dj:dj + res[1]]
        return np.repeat(np.repeat(gg, d0, 0), d1, 1)[:shape[0], :shape[1]]

    def dot(grad, sx, sy):
        return (np.stack([gx + sx, gy + sy], -1) * grad).sum(-1)

    n00 = dot(g(0, 0), 0, 0)
    n10 = dot(g(1, 0), -1, 0)
    n01 = dot(g(0, 1), 0, -1)
    n11 = dot(g(1, 1), -1, -1)
    t = 6 * grid**5 - 15 * grid**4 + 10 * grid**3
    nx0 = n00 * (1 - t[..., 0]) + n10 * t[..., 0]
    nx1 = n01 * (1 - t[..., 0]) + n11 * t[..., 0]
    return np.sqrt(2) * (nx0 * (1 - t[..., 1]) + nx1 * t[..., 1]).astype(np.float32)


# ---------------------------------------------------------------------------
# curriculum terrain grid (anymal_terrain.py Terrain class)
# ---------------------------------------------------------------------------

class TerrainGrid:
    """Rows = difficulty (curriculum levels), columns = terrain types.

    Parity with the reference's `Terrain` (anymal_terrain.py:541-671):
    proportions pick [smooth slope, rough slope, stairs up, stairs down,
    discrete]; difficulty scales slope/step height. Exposes per-(row, col)
    env origins for spawn placement (`:256-275`) and a single stitched
    heightfield for contact.
    """

    def __init__(self, num_levels=10, num_types=5, cells=80,
                 horizontal_scale=0.1, vertical_scale=1.0, border=10, seed=0):
        rng = np.random.RandomState(seed)
        self.num_levels = num_levels
        self.num_types = num_types
        self.cells = cells
        H = num_levels * cells + 2 * border
        W = num_types * cells + 2 * border
        hf = np.zeros((H, W), np.float32)
        self.env_origins = np.zeros((num_levels, num_types, 3), np.float32)
        for lev in range(num_levels):
            difficulty = (lev + 1) / num_levels
            for typ in range(num_types):
                sub = self._make(typ, difficulty, (cells, cells),
                                 horizontal_scale, rng)
                i0 = border + lev * cells
                j0 = border + typ * cells
                hf[i0:i0 + cells, j0:j0 + cells] = sub
                cx = (i0 + cells // 2) * horizontal_scale
                cy = (j0 + cells // 2) * horizontal_scale
                cz = float(sub[cells // 2, cells // 2]) * vertical_scale
                self.env_origins[lev, typ] = (cx, cy, cz)
        self.field = Heightfield(hf, horizontal_scale, vertical_scale)

    def _make(self, typ, difficulty, shape, hs, rng):
        if typ == 0:
            return pyramid_sloped_terrain(shape, slope=0.3 * difficulty * hs)
        if typ == 1:
            return (pyramid_sloped_terrain(shape, slope=0.3 * difficulty * hs)
                    + random_uniform_terrain(shape, -0.05, 0.05, 0.005, rng))
        if typ == 2:
            return pyramid_stairs_terrain(shape, max(2, int(0.31 / hs)),
                                          0.05 + 0.13 * difficulty)
        if typ == 3:
            return -pyramid_stairs_terrain(shape, max(2, int(0.31 / hs)),
                                           0.05 + 0.13 * difficulty)
        return discrete_obstacles_terrain(shape, 0.05 + difficulty * 0.1, 4, 8,
                                          20, rng)
