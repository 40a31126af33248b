from .pairwise import gravity_accel, charged_force, pairwise_accel_reference
