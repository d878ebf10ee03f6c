from lcgan_tpu.data.dataset import ImageFolderDataset, TrainInputPipeline

__all__ = ["ImageFolderDataset", "TrainInputPipeline"]
