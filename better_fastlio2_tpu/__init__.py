"""better_fastlio2_tpu — TPU-native LiDAR-inertial SLAM framework.

JAX/XLA/Pallas re-design of the capabilities of Yixin-F/better_fastlio2
(see SURVEY.md for the reference inventory and PARITY.md for the mapping).
"""

import jax as _jax

# TPU matmuls default to bfloat16 multiplies (8-bit mantissa).  SLAM
# geometry cannot survive that: a point-to-plane residual n·p at 60 m
# world coordinates picks up ~0.25 m of rounding — the filter diverges
# to NaN within scans (observed on v5e; CPU f32 is fine).  Every matmul
# and einsum in this package assumes true-f32 semantics; kernels that can
# safely use lower precision (e.g. Scan Context retrieval) opt in
# explicitly via precision= at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")
