from .stablehlo import export_sampler, save_exported, load_and_run_serialized
