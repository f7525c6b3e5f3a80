from .ring import ContinuousRing, IoBuffer
