from . import fake_quant, int_matmul
