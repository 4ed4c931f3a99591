from . import eval as evaluation
from . import torch_import
