from .peaks import PeakDetector, PeakDetector1stOrder, PeakDetectorOffline
from .rolling_median import RollingWindowMedian, rolling_median
