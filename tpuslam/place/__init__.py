from .vocab import BinaryVocabulary, train_vocabulary
from .kfdb import KeyFrameDatabase
from .orbvoc import load_orbvoc, save_orbvoc_text, save_orbvoc_binary
