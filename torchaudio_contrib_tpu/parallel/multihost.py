"""Multi-host (pod / pod-slice) setup helpers.

Single-host multi-chip works with :func:`~.sharding.make_mesh` alone
(GSPMD over ICI).  On a multi-host pod slice, JAX needs the distributed
runtime initialized before any device access; these helpers wrap that
plus the recommended mesh layout:

* **data axis across hosts** (batch shards only ever cross DCN for
  resharding — the feature pipeline has no steady-state collectives), and
* **model axis within a host** (the trainable-frontend TP axis rides ICI).

This module is exercised in CI only in its single-process degenerate
form (the environment here has one host, one chip); the calls are the
standard `jax.distributed` / `mesh_utils` entry points.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["initialize_multihost", "make_pod_mesh"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent, no-op for a
    single process).

    With no arguments, relies on the TPU metadata autodetection
    (`jax.distributed.initialize()` with defaults) — the standard path on
    Cloud TPU pods.  Explicit arguments (or ``COORDINATOR_ADDRESS`` /
    ``NUM_PROCESSES`` / ``PROCESS_ID`` env vars) override for other
    clusters.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if num_processes is not None and num_processes <= 1:
        return  # single process: nothing to initialize
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def make_pod_mesh(n_model: int = 1) -> Mesh:
    """`(data, model)` mesh over ALL global devices, laid out so the
    model axis stays within a host (ICI) and data spans hosts (DCN).

    Uses `mesh_utils.create_device_mesh` for physical-topology-aware
    ordering when possible; falls back to the flat device list.
    """
    devices = jax.devices()
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    shape = (n // n_model, n_model)
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:  # heterogeneous/virtual topologies
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=("data", "model"))
