"""Heightfield terrain as pure functions over a sampled grid.

Replaces the Isaac Gym terrain builders (RL_Environment/sim_utils.py:136-240)
— which produce PhysX heightfield/trimesh assets — with a (H, W) height grid
+ bilinear sampling that the jitted physics queries directly on-device.

Builders mirror the reference set: flat, slope platform, stairs, pyramid,
random-uniform, and the 4-patch uneven terrain.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Terrain(NamedTuple):
    height: jnp.ndarray       # (H, W) meters
    cell_size: jnp.ndarray    # () meters per cell
    origin: jnp.ndarray       # (2,) world xy of grid corner (0,0)


def flat(extent: float = 40.0, cell: float = 0.1) -> Terrain:
    n = int(extent / cell)
    return Terrain(height=jnp.zeros((n, n), jnp.float32),
                   cell_size=jnp.float32(cell),
                   origin=jnp.array([-extent / 2, -extent / 2], jnp.float32))


def slope_platform(slope: float = 0.2, extent: float = 40.0,
                   cell: float = 0.1, start_x: float = 2.0) -> Terrain:
    """Ramp rising with given slope after start_x (sim_utils.add_terrain
    'slope', :136-160)."""
    n = int(extent / cell)
    xs = np.arange(n) * cell - extent / 2
    h = np.maximum(0.0, (xs - start_x)) * slope
    grid = np.tile(h[:, None], (1, n)).astype(np.float32)
    return Terrain(height=jnp.array(grid), cell_size=jnp.float32(cell),
                   origin=jnp.array([-extent / 2, -extent / 2], jnp.float32))


def stairs(step_height: float = 0.06, step_run: float = 0.3,
           extent: float = 40.0, cell: float = 0.1,
           start_x: float = 2.0) -> Terrain:
    """Staircase along +x (sim_utils 'stair' terrain, :161-190)."""
    n = int(extent / cell)
    xs = np.arange(n) * cell - extent / 2
    steps = np.floor(np.maximum(0.0, xs - start_x) / step_run)
    h = steps * step_height
    grid = np.tile(h[:, None].astype(np.float32), (1, n))
    return Terrain(height=jnp.array(grid), cell_size=jnp.float32(cell),
                   origin=jnp.array([-extent / 2, -extent / 2], jnp.float32))


def random_uniform(seed: int = 0, amplitude: float = 0.04,
                   extent: float = 40.0, cell: float = 0.1,
                   smooth: int = 2) -> Terrain:
    """Random-uniform rough terrain (sim_utils.add_random_uniform_terrain,
    :191-240), lightly smoothed so gradients exist."""
    rng = np.random.default_rng(seed)
    n = int(extent / cell)
    grid = rng.uniform(-amplitude, amplitude, (n, n)).astype(np.float32)
    for _ in range(smooth):
        grid = 0.25 * (np.roll(grid, 1, 0) + np.roll(grid, -1, 0)
                       + np.roll(grid, 1, 1) + np.roll(grid, -1, 1))
    # flat spawn pad in the middle
    c = n // 2
    pad = int(1.5 / cell)
    grid[c - pad:c + pad, c - pad:c + pad] = 0.0
    return Terrain(height=jnp.array(grid), cell_size=jnp.float32(cell),
                   origin=jnp.array([-extent / 2, -extent / 2], jnp.float32))


def uneven_patches(seed: int = 0, extent: float = 40.0,
                   cell: float = 0.1) -> Terrain:
    """4-quadrant mixed terrain: flat / rough / slope / stairs
    (sim_utils' 4-patch uneven heightfield)."""
    n = int(extent / cell)
    half = n // 2
    rough = np.asarray(random_uniform(seed, extent=extent, cell=cell).height)
    slope = np.asarray(slope_platform(0.15, extent, cell, 0.0).height)
    stair = np.asarray(stairs(0.05, 0.3, extent, cell, 0.0).height)
    grid = np.zeros((n, n), np.float32)
    grid[half:, :half] = rough[half:, :half]
    grid[:half, half:] = slope[:half, half:]
    grid[half:, half:] = stair[half:, half:]
    # blend quadrant boundaries so the spawn pad doesn't end in a cliff
    for _ in range(4):
        grid = 0.2 * (np.roll(grid, 1, 0) + np.roll(grid, -1, 0)
                      + np.roll(grid, 1, 1) + np.roll(grid, -1, 1)) \
            + 0.2 * grid
    c = n // 2
    pad = int(1.0 / cell)
    grid[c - pad:c + pad, c - pad:c + pad] = 0.0
    return Terrain(height=jnp.array(grid), cell_size=jnp.float32(cell),
                   origin=jnp.array([-extent / 2, -extent / 2], jnp.float32))


def sample_height(terrain: Terrain, xy):
    """Bilinear height at world xy (..., 2) -> (...)."""
    g = (xy - terrain.origin) / terrain.cell_size
    h, w = terrain.height.shape
    gx = jnp.clip(g[..., 0], 0.0, h - 1.001)
    gy = jnp.clip(g[..., 1], 0.0, w - 1.001)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx, fy = gx - x0, gy - y0
    h00 = terrain.height[x0, y0]
    h10 = terrain.height[x0 + 1, y0]
    h01 = terrain.height[x0, y0 + 1]
    h11 = terrain.height[x0 + 1, y0 + 1]
    return ((1 - fx) * (1 - fy) * h00 + fx * (1 - fy) * h10
            + (1 - fx) * fy * h01 + fx * fy * h11)


def sample_normal(terrain: Terrain, xy, eps: float = 0.05):
    """Finite-difference surface normal at world xy -> (..., 3), unit."""
    ex = jnp.array([eps, 0.0], jnp.float32)
    ey = jnp.array([0.0, eps], jnp.float32)
    dhdx = (sample_height(terrain, xy + ex) - sample_height(terrain, xy - ex)) / (2 * eps)
    dhdy = (sample_height(terrain, xy + ey) - sample_height(terrain, xy - ey)) / (2 * eps)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
