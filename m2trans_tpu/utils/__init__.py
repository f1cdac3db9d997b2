from m2trans_tpu.utils.experiment import (  # noqa: F401
    ExperimentLogger,
    cur_timestamp_str,
    get_stat_dict,
    setup_experiment,
)
from m2trans_tpu.utils.flops import (  # noqa: F401
    model_complexity_report,
    model_flops,
)
