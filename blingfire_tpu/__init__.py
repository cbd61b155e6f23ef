"""blingfire_tpu — TPU-native finite-state text tokenization framework.

Public surface:
  api          — product API (TextToIds/Words/Sentences/Hashes… per
                 blingfiretokdll.h:25-103) with batched TPU entry points
  compat       — drop-in mirror of the reference `blingfire` python binding
  compiler     — offline model compilers (lex, dict, wordpiece, hyph, morph)
  load_morph   — legacy morphology LDB loader (guessers, HMM tagger,
                 stemmer, tag dict, WRE parser; FAMorphLDB_t_packaged.h)
"""

from .runtime.morph import MorphLdb, load_morph, load_regexp_tags  # noqa: F401
