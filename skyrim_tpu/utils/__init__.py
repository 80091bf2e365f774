from skyrim_tpu.utils.logging import logger  # noqa: F401
from skyrim_tpu.utils.timing import timeit, Timer  # noqa: F401
