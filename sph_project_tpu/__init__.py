"""sph_project_tpu: TPU-native SPH framework (jason-huang03/SPH_Project rebuilt
for JAX/XLA/Pallas — see README.md)."""
import jax as _jax

# Physics code: every matmul/einsum must be f32-exact. The TPU MXU's default
# precision is bf16 (8 mantissa bits) — rigid-rotation matvecs and the CG
# block preconditioner would silently round to ~0.4% error. HIGHEST uses the
# exact-for-f32 bf16x3/x6 passes. (The Taichi reference computes everything
# in f32 CUDA cores; this is the TPU equivalent.)
_jax.config.update("jax_default_matmul_precision", "highest")
