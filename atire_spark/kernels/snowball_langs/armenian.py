"""Snowball Armenian stemmer.

Independent Python implementation of the published Snowball Armenian
algorithm (snowballstem.org, contributed by Astghik Mkrtchyan),
matching the reference's ``-tsnowball:armenian`` slot
(source/stemmer_factory.c:39 via libstemmer).  Parity with the
compiled libstemmer the reference ships is certified by a
full-wordlist sweep; frozen cases live in
tests/test_snowball_langs.py.

Four plain longest-match delete tables (case endings, verb forms,
adjective suffixes, noun suffixes) applied in that order, all inside
RV (after the first vowel); the case endings additionally require R2.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import (
    gopast_in,
    mark_r1r2,
    sort_by_len,
)

_HY_VOWELS = frozenset("\u0561\u0565\u0567\u0568\u056b\u0578\u0582\u0585")

_HY_ADJECTIVE = sort_by_len([
    'բար', 'րորդ', 'երորդ', 'ալի', 'ակի', 'որակ', 'եղ', 'վուն', 'արան',
    'ական', 'են', 'երեն', 'եկեն', 'որէն', 'ին', 'գին', 'ովին', 'լայն',
    'պես', 'իվ', 'ատ', 'ավետ', 'կոտ'
])

_HY_VERB = sort_by_len([
    'ար', 'ացար', 'եցար', 'ացրիր', 'ացիր', 'եցիր', 'վեցիր', 'ալուց',
    'ելուց', 'աց', 'եց', 'ացրեց', 'ալու', 'ելու', 'աք', 'ցաք', 'ացաք',
    'ացրիք', 'ացիք', 'եցիք', 'վեցիք', 'անք', 'ցանք', 'ացանք', 'ացրինք',
    'ացինք', 'եցինք', 'վեցինք', 'ա', 'ացա', 'եցա', 'վե', 'ացրի', 'ացի',
    'եցի', 'վեցի', 'ալ', 'ըալ', 'ացնալ', 'անալ', 'ենալ', 'ել', 'ըել',
    'նել', 'ցնել', 'եցնել', 'չել', 'վել', 'ացվել', 'եցվել', 'տել',
    'ատել', 'ոտել', 'կոտել', 'ված', 'ում', 'վում', 'ան', 'ցան', 'ացան',
    'ացրին', 'ացին', 'եցին', 'վեցին', 'ալիս', 'ելիս', 'ավ', 'ացավ',
    'եցավ', 'ալով', 'ելով'
])

_HY_NOUN = sort_by_len([
    'գար', 'վոր', 'ավոր', 'անօց', 'ոց', 'ու', 'ք', 'արք', 'չեք', 'իք',
    'ալիք', 'անիք', 'վածք', 'ույք', 'ունք', 'մունք', 'ենք', 'ոնք', 'իչք',
    'որդ', 'ույթ', 'ցի', 'ուհի', 'իլ', 'ուկ', 'ակ', 'յակ', 'անակ', 'իկ',
    'յուն', 'ություն', 'ան', 'արան', 'պան', 'ստան', 'եղէն', 'ածո', 'իչ',
    'ուս', 'ուստ'
])

_HY_ENDING = sort_by_len([
    'եր', 'ներ', 'ց', 'ուց', 'ից', 'երից', 'ներից', 'ցից', 'վանից',
    'ոջից', 'վից', 'ոց', 'սա', 'վա', 'ամբ', 'դ', 'երդ', 'ներդ', 'ուդ',
    'անդ', 'ությանդ', 'վանդ', 'ոջդ', 'ը', 'երը', 'ները', 'անը',
    'ությանը', 'վանը', 'ոջը', 'ի', 'երի', 'ների', 'վի', 'երում',
    'ներում', 'անում', 'ն', 'երն', 'ներն', 'ուն', 'ան', 'ության', 'վան',
    'ին', 'երին', 'ներին', 'ությանն', 'ոջ', 'ությանս', 'վանս', 'ոջս',
    'ով', 'երով', 'ներով', 'անով', 'վով'
])


def _hy_strip(w: str, rv: int, table, p2: int | None = None) -> str:
    for s in table:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            if p2 is not None and pos < p2:
                return w
            return w[:pos]
    return w


def stem_snowball_armenian(word: str) -> str:
    w = word
    rv = gopast_in(w, 0, _HY_VOWELS)
    if rv < 0:
        return w
    _, p2 = mark_r1r2(w, _HY_VOWELS)
    w = _hy_strip(w, rv, _HY_ENDING, p2=p2)
    w = _hy_strip(w, rv, _HY_VERB)
    w = _hy_strip(w, rv, _HY_ADJECTIVE)
    w = _hy_strip(w, rv, _HY_NOUN)
    return w
