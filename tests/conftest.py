"""Test configuration: run everything on CPU with 8 virtual devices so
sharding / halo-exchange tests work without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin
and force-sets jax_platforms at registration time, so the override must go
through jax.config *after* importing jax — env vars alone are clobbered.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the suite's resident memory: compiled XLA-CPU programs
    accumulate across all ~215 tests (the heavy interpret-mode Pallas
    traces especially) and by the LAST module the process brushes the
    host's 63 GB commit limit — observed as a segfault inside XLA at
    99% of an otherwise-green run (round 5). Dropping the compilation
    caches after each module trades a few re-compiles of shared helpers
    for a flat memory profile."""
    yield
    jax.clear_caches()
    gc.collect()
