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
