"""Model training pipelines (TPU-first re-design of the reference's
Snakemake/Keras training stacks, training/barcodes/ and
training/signal-scaling/): pure-JAX forward passes shared with inference,
optax optimizers, jit-compiled train steps with batch-sharded data
parallelism over a device mesh, and npz checkpoints loadable by the
inference model wrappers."""
