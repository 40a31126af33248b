from .metrics import (
    tot_energy_charged_batch,
    tot_energy_gravity_batch,
    conserved_energy,
    energy_drift,
    pearson_correlation_batch,
)
from .checkpoint import EarlyStopping, load_params, save_params
