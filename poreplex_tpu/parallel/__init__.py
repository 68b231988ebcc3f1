"""Parallelism: device meshes, sharded batch execution, multi-host
coordination.

The reference's parallelism was a single-host process pool with pickled
batches (poreplex/pipeline.py:96-98; SURVEY.md §2.3). The TPU-native
equivalents here:

  mesh.py         1-D 'batch' data-parallel mesh over local or global devices
  sharding.py     NamedSharding helpers: batch-sharded inputs, replicated
                  weights; sharded stage execution
  distributed.py  multi-host init, file-list sharding, collective reduction
                  of status/barcode count matrices (psum over the mesh)
"""
