from .design import (FilterKind, FilterType, butterworth_1st,
                     butterworth_2nd, butterworth_bandpass_1st,
                     butterworth_bandpass_2nd, create_filter_iir)
from .streaming import Delay, FirFilter, IirFilter, new_fir, new_iir
