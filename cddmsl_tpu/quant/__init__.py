from .ptq import (
    calibrate_res5,
    fold_res5,
    merge_absmax,
    prepare_quant_res5,
    quantize_res5,
    res5_forward_fp_folded,
    res5_forward_int8,
    scales_from_absmax,
)

__all__ = [
    "calibrate_res5",
    "fold_res5",
    "merge_absmax",
    "prepare_quant_res5",
    "quantize_res5",
    "res5_forward_fp_folded",
    "res5_forward_int8",
    "scales_from_absmax",
]
