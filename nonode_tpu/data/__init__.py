from .nbody import NBodyDataset
