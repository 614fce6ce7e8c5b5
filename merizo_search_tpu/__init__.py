"""merizo_search_tpu — a TPU-native protein structural similarity search engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of psipred/merizo_search:

- ``segment``    — Merizo-style invariant-point-attention domain segmentation
                   (reference: merizo_search/programs/Merizo/predict.py)
- ``createdb``   — batched Foldclass-EGNN embedding of structure directories into
                   sharded databases (reference: programs/Foldclass/makedb.py)
- ``search``     — exact cosine top-k over 128-d embedding databases as tiled MXU
                   matmuls with fused top-k selection, sharded over a TPU mesh
                   (reference: programs/Foldclass/dbsearch.py)
- ``easy-search``— segment → embed → search → TM rescoring end-to-end
                   (reference: merizo_search/merizo.py:229)
- ``serve``      — persistent HTTP server: database resident in device HBM,
                   models compiled once, millisecond warm queries (no
                   reference equivalent)

The compute path is pure JAX (jit/pjit/shard_map/Pallas); host-side I/O and
sequential heuristics are NumPy. No torch is required at inference time (torch is
used only by the optional weight converter for loading reference checkpoints).
"""

__version__ = "0.1.0"
