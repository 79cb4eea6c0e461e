"""TPU-native rebuild of RGC-SLAM (jax / XLA / pallas / pjit).

Precision policy: TPU matmuls default to bf16 operands, whose ~8-bit mantissa
is fine for neural nets but corrupts geometric solvers (squared distances at
map-scale coordinates, Gauss-Newton normal equations with 1e3-scaled ground
residuals).  SLAM is estimation, not training — everything here must run the
MXU in full f32 (measured: 10x trajectory-ATE degradation without this).  The
hot-path matmuls that dominate FLOPs (ops/knn.py) set it explicitly as well.
"""
import os as _os
import tempfile as _tempfile

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the big programs here (unrolled
# dispatch-chunk fleet steps, shard_map meshes) compile in minutes; the
# cache makes every later PROCESS a hit (measured over the axon tunnel:
# 12.5 s cold -> 1.2 s warm), which cuts bench/driver/CLI restarts from
# ~20 min of compiles to seconds.  Keyed by HLO + compile options +
# platform, so it is correctness-neutral.  Opt out with RGC_JAX_CACHE=0;
# relocate with RGC_JAX_CACHE_DIR.
if _os.environ.get("RGC_JAX_CACHE", "1") != "0":
    # per-user path: a fixed shared /tmp name would let another local user
    # own the directory (cache silently dead) or pre-plant entries that JAX
    # deserializes and runs (local cache-poisoning vector)
    _uid = _os.getuid() if hasattr(_os, "getuid") else "na"
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "RGC_JAX_CACHE_DIR",
            _os.path.join(_tempfile.gettempdir(), f"rgc_jax_cache-{_uid}"),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
