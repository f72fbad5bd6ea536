from .vocab import BinaryVocabulary, train_vocabulary
from .kfdb import KeyFrameDatabase
