from lcgan_tpu.eval.fid import calc_fid, fid_evaluate
from lcgan_tpu.eval.inception import InceptionV3FID

__all__ = ["calc_fid", "fid_evaluate", "InceptionV3FID"]
