from e2_tts_tpu.utils.helpers import (
    exists,
    default,
    xnor,
    divisible_by,
    set_if_missing_key,
    round_up_to_multiple,
)
from e2_tts_tpu.utils.masking import (
    lens_to_mask,
    mask_from_start_end_indices,
    mask_from_frac_lengths,
    maybe_masked_mean,
    pad_to_length,
)
from e2_tts_tpu.utils.tensor import (
    l2norm,
    project,
    interpolate_1d,
    masked_interpolate_1d,
)

__all__ = [
    'exists', 'default', 'xnor', 'divisible_by', 'set_if_missing_key',
    'round_up_to_multiple',
    'lens_to_mask', 'mask_from_start_end_indices', 'mask_from_frac_lengths',
    'maybe_masked_mean', 'pad_to_length',
    'l2norm', 'project', 'interpolate_1d', 'masked_interpolate_1d',
]
