"""Collective-communication context threaded through the engine.

The reference is strictly single-process (SURVEY.md §2 "Parallelism: none").
Our engine instead runs the same code path single-chip and SPMD: every
cross-row reduction goes through a :class:`Comm`, which is a no-op locally
and maps to XLA collectives (``psum``/``pmax``/``pmin`` over ICI) inside a
``shard_map`` over a device mesh (SURVEY.md §5 "Distributed communication
backend").
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Comm:
    """Reduction context. ``axis=None`` = single device (identity)."""

    axis: Optional[str] = None

    @property
    def distributed(self) -> bool:
        return self.axis is not None

    def psum(self, x):
        return jax.lax.psum(x, self.axis) if self.axis else x

    def pmax(self, x):
        return jax.lax.pmax(x, self.axis) if self.axis else x

    def pmin(self, x):
        return jax.lax.pmin(x, self.axis) if self.axis else x

    def axis_index(self):
        return jax.lax.axis_index(self.axis) if self.axis else jnp.int32(0)

    def axis_size(self):
        if self.axis is None:
            return jnp.int32(1)
        return jax.lax.psum(jnp.int32(1), self.axis)


LOCAL = Comm(axis=None)
