"""kasportsformer_tpu — a TPU-native (JAX/XLA/Pallas) framework for 2D→3D human
pose lifting on short sports videos, with the full capability surface of the
reference KASportsFormer PyTorch repo (arXiv:2507.20763).

Design notes
------------
The reference is a single-process PyTorch research repo (see SURVEY.md). This
framework is a ground-up JAX rebuild:

* models are pure functions over parameter pytrees (`init` / `apply`), so the
  whole train/eval step jits into one XLA program per shape;
* the 26-layer trunk runs under ``jax.lax.scan`` over stacked layer params
  (one compiled layer body instead of 26);
* data lives device-resident — the whole clip set is a few MB, so batching is
  a gather + in-jit augmentation rather than a multiprocess DataLoader;
* parallelism is a ``jax.sharding.Mesh`` (('data','model')): batch sharded on
  'data', optional tensor-parallel sharding of heads/MLP hidden on 'model';
  gradient reduction is XLA all-reduce over ICI, not NCCL;
* hot ops get Pallas TPU kernels (ops/), parity-tested against the jnp path.
"""

__version__ = "0.1.0"
