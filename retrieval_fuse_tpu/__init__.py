"""RetrievalFuse-TPU: a TPU-native JAX framework for retrieval-augmented 3D scene
reconstruction, providing the full capability surface of RetrievalFuse (ICCV 2021,
reference implementation: nihalsid/retrieval-fuse) re-designed for TPU hardware.

Layer map (mirrors reference SURVEY layering, TPU-first internals):
  config/      YAML inheritance + CLI override       (ref: config/config_handler.py)
  data/        scene IO, patch datasets, pipelines   (ref: dataset/)
  models/      encoder zoo, 3D U-Net, attention      (ref: model/)
  ops/         fold/unfold, kNN, chamfer, kernels    (ref: FLANN/CUDA externals)
  retrieval/   dictionary build + kNN + composition  (ref: util/retrieval.py)
  train/       retrieval & refinement trainers       (ref: trainer/)
  evaluation/  rough metrics + mesh metrics          (ref: util/metrics.py, mesh_metrics.py)
  parallel/    mesh / sharding helpers               (ref: Lightning DDP/NCCL)
  utils/       misc, viz, logging, timing            (ref: util/)
  native/      C++ marching cubes + bindings         (ref: marching_cubes C++ ext)

All device compute is JAX (jit/pjit/shard_map + Pallas); layouts are channels-last
(B, D, H, W, C) which is the TPU-natural layout, unlike the reference's NCDHW.
"""

__version__ = "0.1.0"
