from .stablehlo import StableHLOExporter, export_forward, load_exported
