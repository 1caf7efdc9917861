from .partition import make_lr_plan, split_params, merge_params, lr_tree_for
from .state import ScaleTrainState
