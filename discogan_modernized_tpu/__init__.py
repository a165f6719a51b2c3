"""discogan_modernized_tpu — a TPU-native (JAX/XLA/Pallas/pjit) DiscoGAN framework.

A from-scratch rebuild of the capabilities of the PyTorch reference
`fasion-image-generator-project/discogan_modernized` (see SURVEY.md):

- size-parameterized Generator / Discriminator conv stacks (ref: model.py)
- cycle-consistency + GAN + feature-matching loss graph with curriculum
  (ref: image_translation.py:136-168, :366-382)
- data-parallel training over a `jax.sharding.Mesh` (ref DDP/NCCL:
  distributed_image_translation.py) via shard_map + psum
- task data resolvers and the exact host-side preprocessing numerics
  (ref: dataset.py), including the resolvers the reference lost
  (get_cars/get_chairs/get_faces_3d — dataset.py:264-266)
- CLI entry points with the reference flag surface, checkpoint layout
  and training-log contract.

Architecture is TPU-first: NHWC activations, HWIO kernels, bf16 compute
with f32 accumulation/master params, jit-compiled whole train steps, and
sharding expressed on a device mesh — not a translation of the reference's
CUDA/NCCL patterns.
"""

__version__ = "0.1.0"
