from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d
from retrieval_fuse_tpu.ops.knn import exact_knn, sharded_exact_knn
from retrieval_fuse_tpu.ops.sobel import compute_normals, compute_laplacian

__all__ = ["unfold3d", "fold3d", "exact_knn", "sharded_exact_knn", "compute_normals", "compute_laplacian"]
