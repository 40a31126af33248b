from .egno import EGNO
from .segno import SEGNO
from .baselines import GNN, LinearDynamics, RFVel, FullMLP
