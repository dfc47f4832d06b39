"""Angle arithmetic on arrays.

Replaces the reference's `angles` C++ library (used via
`Odom::angleDiff`/`normalize`, reference src/amcl/sensors/odom.cpp:313-321,
and `PlanarScanner::coordAdd`, planar_scanner.cpp:693-701). Works on scalars
and arrays, inside or outside jit.
"""

import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


def normalize_angle(a):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def shortest_angular_distance(frm, to):
    """Signed shortest rotation taking `frm` onto `to`, in (-pi, pi]."""
    return normalize_angle(to - frm)


def angle_diff(a, b):
    """Reference `Odom::angleDiff(a, b)` == shortest_angular_distance(b, a)."""
    return normalize_angle(a - b)
