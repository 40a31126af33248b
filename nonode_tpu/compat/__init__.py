from .torch_port import (
    egno_params_from_state_dict,
    egno_state_dict_from_params,
    segno_params_from_state_dict,
)
