from .torch_pickle import (
    load_reference_pickle,
    extract_state,
    generator_params_from_state,
    generator_config_from_pickle,
    load_generator_pkl,
)
