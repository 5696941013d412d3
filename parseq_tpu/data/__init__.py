from .charset import CharsetAdapter
from .tokenizer import CTCTokenizer, Tokenizer

__all__ = ['CharsetAdapter', 'Tokenizer', 'CTCTokenizer']
