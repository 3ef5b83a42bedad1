from retrieval_fuse_tpu.data.scene import SceneHandler
from retrieval_fuse_tpu.data.patched_dataset import PatchedSceneDataset, CombinedDataset
from retrieval_fuse_tpu.data.loader import batch_iterator

__all__ = ["SceneHandler", "PatchedSceneDataset", "CombinedDataset", "batch_iterator"]
