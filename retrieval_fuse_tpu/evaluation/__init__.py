from retrieval_fuse_tpu.evaluation.metrics import IoU, Chamfer3D, Precision, Recall, batch_occupancy_metrics

__all__ = ["IoU", "Chamfer3D", "Precision", "Recall", "batch_occupancy_metrics"]
