"""TPU-native rebuild of RGC-SLAM (jax / XLA / pallas / pjit).

Precision policy: TPU matmuls default to bf16 operands, whose ~8-bit mantissa
is fine for neural nets but corrupts geometric solvers (squared distances at
map-scale coordinates, Gauss-Newton normal equations with 1e3-scaled ground
residuals).  SLAM is estimation, not training — everything here must run the
MXU in full f32 (measured: 10x trajectory-ATE degradation without this).  The
hot-path matmuls that dominate FLOPs (ops/knn.py) set it explicitly as well.
"""
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
