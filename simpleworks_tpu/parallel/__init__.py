"""Mesh-parallel axes (SURVEY.md §2.4): DP witness checking, sharded
4-step NTT, sharded Pippenger MSM, and the proof pipeline.

Each module exposes a ``*_host`` wrapper taking an explicit
``jax.sharding.Mesh``; :func:`default_mesh` builds one from the typed
config (``config.FrameworkConfig``: axis name + device count)."""

from __future__ import annotations


def default_mesh():
    """A 1-D mesh over the configured device count (all by default) with
    the configured axis name — the mesh every ``*_host`` wrapper expects."""
    import jax
    from jax.sharding import Mesh

    from ..config import DEFAULT_CONFIG

    devices = jax.devices()
    n = DEFAULT_CONFIG.mesh_devices or len(devices)
    return Mesh(devices[:n], (DEFAULT_CONFIG.mesh_axis,))
