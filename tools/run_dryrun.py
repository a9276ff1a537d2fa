#!/usr/bin/env python
"""Run the driver's multi-chip gate locally: ``dryrun_multichip(N)`` on an
N-virtual-device CPU mesh (default 8).

This is the pre-snapshot check that was missing in round 3 (MULTICHIP_r03
recorded rc=124 from a Pallas interpret-mode barrier deadlock that the
in-suite 2-device test could not see).  ``make dryrun`` must pass before
every end-of-round commit.

The sandbox's sitecustomize imports jax at interpreter boot pinned to the
one real TPU, so the CPU override must go through jax.config (same trick
as tests/conftest.py).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import __graft_entry__  # noqa: E402

__graft_entry__.dryrun_multichip(n)
print(f"dryrun ok at {n} virtual devices")
