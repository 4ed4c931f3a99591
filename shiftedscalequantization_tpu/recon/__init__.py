from .capture import capture_io
from .engine import ReconSettings, reconstruct_act_delta, reconstruct_node
from .pipeline import reconstruct_model
