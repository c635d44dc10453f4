"""Snowball language stemmers (the reference's -tsnowball:<lang>
slots, stemmer_factory.c:39-60 via libstemmer).

Each module is an independent Python implementation of the published
Snowball algorithm for its language, verified against the compiled
libstemmer_c the reference ships (tests/test_snowball_langs.py).
English (Porter2) and Lovins predate this package and live in
kernels/snowball.py and kernels/lovins.py.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs.armenian import stem_snowball_armenian
from atire_spark.kernels.snowball_langs.basque import stem_snowball_basque
from atire_spark.kernels.snowball_langs.kraaij_pohlmann import (
    stem_snowball_kraaij_pohlmann,
)
from atire_spark.kernels.snowball_langs.turkic import stem_snowball_turkish
from atire_spark.kernels.snowball_langs.germanic import (
    stem_snowball_dutch,
    stem_snowball_german,
    stem_snowball_german2,
)
from atire_spark.kernels.snowball_langs.porter import stem_snowball_porter
from atire_spark.kernels.snowball_langs.romance import (
    stem_snowball_catalan,
    stem_snowball_french,
    stem_snowball_italian,
    stem_snowball_portuguese,
    stem_snowball_romanian,
    stem_snowball_spanish,
)
from atire_spark.kernels.snowball_langs.slavic import stem_snowball_russian
from atire_spark.kernels.snowball_langs.uralic import (
    stem_snowball_finnish,
    stem_snowball_hungarian,
)
from atire_spark.kernels.snowball_langs.scandinavian import (
    stem_snowball_danish,
    stem_snowball_norwegian,
    stem_snowball_swedish,
)

__all__ = [
    "stem_snowball_armenian",
    "stem_snowball_kraaij_pohlmann",
    "stem_snowball_turkish",
    "stem_snowball_basque",
    "stem_snowball_catalan",
    "stem_snowball_finnish",
    "stem_snowball_hungarian",
    "stem_snowball_french",
    "stem_snowball_romanian",
    "stem_snowball_russian",
    "stem_snowball_italian",
    "stem_snowball_portuguese",
    "stem_snowball_spanish",
    "stem_snowball_dutch",
    "stem_snowball_german",
    "stem_snowball_german2",
    "stem_snowball_porter",
    "stem_snowball_danish",
    "stem_snowball_norwegian",
    "stem_snowball_swedish",
]
