from .torch_pickle import (
    load_reference_pickle,
    extract_state,
    generator_params_from_state,
    generator_config_from_pickle,
    load_generator_pkl,
)
from .tf_legacy import (
    convert_tf_generator,
    is_tf_pickle,
    load_tf_network_pkl,
    load_tf_pickle,
)
