from nlbac_tpu.utils.output import (  # noqa: F401
    get_output_folder,
    setup_logger_kwargs,
)
from nlbac_tpu.utils.serialization import convert_json  # noqa: F401
