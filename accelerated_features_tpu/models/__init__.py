from .backbone import (fine_matcher_forward, space_to_depth, upsample_bilinear,
                       xfeat_forward)
from .params import (count_params, export_torch_state_dict, fold_batchnorm,
                     import_torch_state_dict, init_xfeat_params)

__all__ = [
    "xfeat_forward", "fine_matcher_forward", "space_to_depth",
    "upsample_bilinear", "init_xfeat_params", "import_torch_state_dict",
    "export_torch_state_dict", "fold_batchnorm", "count_params",
]
