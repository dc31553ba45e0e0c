from . import lowrank, outliers, quant, simulated  # noqa: F401
