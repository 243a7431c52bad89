"""Curve tessellation formulas, copied verbatim from the reference.

Citations into /root/reference/src/infrastructure/database/postgis/
postgis_entity_converter.py — the point counts (always 100) and the exact
numpy expressions are part of the correctness contract (WKB equality):

- circle  :272-278  linspace(0, 2π, 100), z = center z
- arc     :297-303  linspace(radians(start), radians(end), 100)
- ellipse :330-336  x = cx + major.x*cos(t)*ratio ; y = cy + major.y*sin(t)
                    (the reference's own non-standard parameterization —
                    reproduced verbatim, do NOT "fix")
- helix   :685-691  linspace(0, 2π·turns, 100),
                    z = base.z + (t / (2π·turns))·height
"""

from __future__ import annotations

import numpy as np

N_TESSELLATION = 100

# the full-circle angle grid is the same for every CIRCLE — hoisting the
# linspace + trig out of the per-entity call is bit-exact (identical
# angles → identical cos/sin values; the per-entity scale-and-shift below
# is unchanged) and saves ~2/3 of circle tessellation time
_CIRCLE_COS = np.cos(np.linspace(0, 2 * np.pi, N_TESSELLATION))
_CIRCLE_SIN = np.sin(np.linspace(0, 2 * np.pi, N_TESSELLATION))


def circle_points(cx: float, cy: float, cz: float, radius: float) -> np.ndarray:
    pts = np.empty((N_TESSELLATION, 3), dtype=np.float64)
    pts[:, 0] = cx + radius * _CIRCLE_COS
    pts[:, 1] = cy + radius * _CIRCLE_SIN
    pts[:, 2] = cz
    return pts


def arc_points(cx: float, cy: float, cz: float, radius: float, start_angle_deg: float, end_angle_deg: float) -> np.ndarray:
    angles = np.linspace(np.radians(start_angle_deg), np.radians(end_angle_deg), N_TESSELLATION)
    pts = np.empty((N_TESSELLATION, 3), dtype=np.float64)
    pts[:, 0] = cx + radius * np.cos(angles)
    pts[:, 1] = cy + radius * np.sin(angles)
    pts[:, 2] = cz
    return pts


def ellipse_points(
    cx: float, cy: float, cz: float,
    major_x: float, major_y: float,
    ratio: float, start_param: float, end_param: float,
) -> np.ndarray:
    angles = np.linspace(start_param, end_param, N_TESSELLATION)
    pts = np.empty((N_TESSELLATION, 3), dtype=np.float64)
    pts[:, 0] = cx + major_x * np.cos(angles) * ratio
    pts[:, 1] = cy + major_y * np.sin(angles)
    pts[:, 2] = cz
    return pts


def helix_points(bx: float, by: float, bz: float, radius: float, turns: float, height: float) -> np.ndarray:
    total = 2 * np.pi * turns
    angles = np.linspace(0, total, N_TESSELLATION)
    pts = np.empty((N_TESSELLATION, 3), dtype=np.float64)
    pts[:, 0] = bx + radius * np.cos(angles)
    pts[:, 1] = by + radius * np.sin(angles)
    pts[:, 2] = bz + (angles / total) * height
    return pts
