from .torch_port import (
    egno_params_from_state_dict,
    segno_params_from_state_dict,
)
