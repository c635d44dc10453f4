"""Snowball language-stemmer parity tests (porter, danish,
norwegian, swedish).

Expected stems VERIFIED AGAINST THE COMPILED REFERENCE LIBSTEMMER: a
harness around sb_stemmer_new(<lang>) built from the libstemmer_c
tree the reference ships (external/unencumbered/snowball) was swept
over per-language word lists (corpus vocabulary + every among-table
suffix glued onto synthetic stems + seeded random strings over each
language's alphabet, 5.5-6.9k words per language); the Python kernels
matched every word.  The tables below freeze 40 rule-exercising cases
per language from those sweeps.
"""

from __future__ import annotations

import pytest

from atire_spark.kernels.snowball_langs import (
    stem_snowball_catalan,
    stem_snowball_danish,
    stem_snowball_french,
    stem_snowball_italian,
    stem_snowball_portuguese,
    stem_snowball_romanian,
    stem_snowball_russian,
    stem_snowball_spanish,
    stem_snowball_dutch,
    stem_snowball_german,
    stem_snowball_german2,
    stem_snowball_norwegian,
    stem_snowball_porter,
    stem_snowball_swedish,
)

_PORTER_CASES = [
    ('abing', 'ab'),
    ('ahsodnaenphfa', 'ahsodnaenphfa'),
    ('aous', 'aou'),
    ('arbejaliti', 'arbej'),
    ('bat', 'bat'),
    ('bhbreization', 'bhbreizat'),
    ('bnzrliakw', 'bnzrliakw'),
    ('btcbukqlskbzq', 'btcbukqlskbzq'),
    ('bvcyreed', 'bvcyre'),
    ('bvcyrenci', 'bvcyrenc'),
    ('bvcyriciti', 'bvcyric'),
    ('emubational', 'emub'),
    ('ewvxsyic', 'ewvxsyic'),
    ('grandible', 'grandibl'),
    ('iesies', 'iesi'),
    ('invvslady', 'invvsladi'),
    ('ioed', 'io'),
    ('ipcqwve', 'ipcqwv'),
    ('jrvfdsalize', 'jrvfdsaliz'),
    ('kapabli', 'kapabl'),
    ('kleineed', 'kleine'),
    ('kleinical', 'kleinic'),
    ('nerdance', 'nerdanc'),
    ('nopdcjtsxbde', 'nopdcjtsxbd'),
    ('osolizer', 'osol'),
    ('ousous', 'ousou'),
    ('pkxojticiti', 'pkxojtic'),
    ('przyicate', 'przyicat'),
    ('przysses', 'przyss'),
    ('rdfulness', 'rdful'),
    ('sfyuecjms', 'sfyuecjm'),
    ('ugldrwY', 'ugldrwi'),
    ('ugldrwfulness', 'ugldrw'),
    ('uoskqqupmzjms', 'uoskqqupmzjm'),
    ('uusanci', 'uusanc'),
    ('uxilohi', 'uxilohi'),
    ('vennligousli', 'vennlig'),
    ('vennligsses', 'vennligss'),
    ('wdlus', 'wdlu'),
    ('zkkwlties', 'zkkwlti'),
]

_DANISH_CASES = [
    ('aerne', 'aern'),
    ('ahputapæfosoxp', 'ahputapæfosoxp'),
    ('bende', 'bend'),
    ('beren', 'ber'),
    ('brcåepnhuøvd', 'brcåepnhuøvd'),
    ('bustææhkw', 'bustææhkw'),
    ('cantheder', 'cant'),
    ('cdqnfyhedens', 'cdqnfyhed'),
    ('cnheds', 'cnhed'),
    ('customer', 'custom'),
    ('cyrszåæende', 'cyrszåæ'),
    ('epnberet', 'epnb'),
    ('husernes', 'hus'),
    ('kapethed', 'kap'),
    ('kaplig', 'kap'),
    ('kapløst', 'kapløs'),
    ('kaps', 'kap'),
    ('kleinernes', 'klein'),
    ('kwkæje', 'kwkæj'),
    ('mesoss', 'mesos'),
    ('ncqlrxgæcmnuås', 'ncqlrxgæcmnuå'),
    ('påkxojene', 'påkxoj'),
    ('qetutcpspakqk', 'qetutcpspakqk'),
    ('qgeren', 'qger'),
    ('røheds', 'røhed'),
    ('sbssmbheret', 'sbssmbher'),
    ('sjheder', 'sjhed'),
    ('skole', 'skol'),
    ('skolgt', 'skolg'),
    ('skols', 'skol'),
    ('soljhets', 'soljh'),
    ('soljhig', 'soljh'),
    ('stmko', 'stmko'),
    ('toprr', 'topr'),
    ('vrnykes', 'vrnyk'),
    ('yzoizys', 'yzoizy'),
    ('zncuwl', 'zncuwl'),
    ('ærene', 'æren'),
    ('ærhtsomqfacs', 'ærhtsomqfac'),
    ('æseren', 'æser'),
]

_NORWEGIAN_CASES = [
    ('abcet', 'abc'),
    ('ahetens', 'ahet'),
    ('aå', 'aå'),
    ('bbmoqæate', 'bbmoqæat'),
    ('bendes', 'bend'),
    ('boygff', 'boygff'),
    ('bsfjw', 'bsfjw'),
    ('cantlov', 'cant'),
    ('chcrnede', 'chcrned'),
    ('cyrszåæelig', 'cyrszåæ'),
    ('cyrszåæen', 'cyrszåæ'),
    ('cyrszåæers', 'cyrszåæ'),
    ('epnbhetene', 'epnb'),
    ('fbtåawajtu', 'fbtåawajtu'),
    ('ireffe', 'ireff'),
    ('kleinels', 'kleinel'),
    ('kleines', 'klein'),
    ('kleinet', 'klein'),
    ('kleinets', 'klein'),
    ('kwltenes', 'kwlten'),
    ('lsane', 'lsan'),
    ('przyelig', 'przyel'),
    ('przyerte', 'przyert'),
    ('pævquqtld', 'pævquqtld'),
    ('qgane', 'qgan'),
    ('røenes', 'røen'),
    ('skola', 'skol'),
    ('skolendes', 'skol'),
    ('soljheig', 'soljh'),
    ('soljhelov', 'soljh'),
    ('soljhheten', 'soljh'),
    ('spawea', 'spawe'),
    ('tandt', 'tand'),
    ('tanlov', 'tan'),
    ('tgede', 'tged'),
    ('vennlighetslov', 'vennlig'),
    ('wyhheter', 'wyh'),
    ('zbdviyxprn', 'zbdviyxprn'),
    ('æsels', 'æsel'),
    ('øhhilpgmbjes', 'øhhilpgmbj'),
]

_SWEDISH_CASES = [
    ('adeade', 'ade'),
    ('adt', 'adt'),
    ('arbejerns', 'arbej'),
    ('arbejhetens', 'arbej'),
    ('bilnn', 'biln'),
    ('chcrnade', 'chcrnad'),
    ('chcrnanden', 'chcrnand'),
    ('chcrnarne', 'chcrnarn'),
    ('dssor', 'dssor'),
    ('ejduåäya', 'ejduåäy'),
    ('grandnn', 'grandn'),
    ('ibqle', 'ibql'),
    ('jarcmlubgtaba', 'jarcmlubgtab'),
    ('jcsäöpee', 'jcsäöpe'),
    ('jcätntägos', 'jcätntägo'),
    ('jneheten', 'jnehet'),
    ('kapande', 'kap'),
    ('kleindd', 'kleind'),
    ('kleinerna', 'klein'),
    ('lsade', 'lsad'),
    ('npöuyzads', 'npöuyzad'),
    ('påtehpioad', 'påtehpio'),
    ('pökxojast', 'pökxoj'),
    ('qgandes', 'qgand'),
    ('rw', 'rw'),
    ('rzhelnrpmabs', 'rzhelnrpmab'),
    ('råarna', 'råarn'),
    ('råer', 'råer'),
    ('siqmgliva', 'siqmgliv'),
    ('skewhlifbiudå', 'skewhlifbiudå'),
    ('soljhandes', 'soljh'),
    ('vbzqrtmteuvww', 'vbzqrtmteuvww'),
    ('vennligerna', 'venn'),
    ('vrnyka', 'vrnyk'),
    ('vrnykels', 'vrnykel'),
    ('vrnykhet', 'vrnyk'),
    ('ypqrsma', 'ypqrsm'),
    ('ywasytya', 'ywasyty'),
    ('ärandes', 'ärand'),
    ('åafzxäauze', 'åafzxäauz'),
]

@pytest.mark.parametrize("word,expected", _PORTER_CASES)
def test_snowball_porter_parity(word, expected):
    assert stem_snowball_porter(word) == expected


@pytest.mark.parametrize("word,expected", _DANISH_CASES)
def test_snowball_danish_parity(word, expected):
    assert stem_snowball_danish(word) == expected


@pytest.mark.parametrize("word,expected", _NORWEGIAN_CASES)
def test_snowball_norwegian_parity(word, expected):
    assert stem_snowball_norwegian(word) == expected


@pytest.mark.parametrize("word,expected", _SWEDISH_CASES)
def test_snowball_swedish_parity(word, expected):
    assert stem_snowball_swedish(word) == expected


def test_registered_in_stemmer_factory():
    """The four languages ride the standard index/query stemmer gates
    (index_document.c:103-111, search_engine.c:775-779)."""
    from atire_spark.kernels.stem import STEMMERS, index_stem, query_stem

    for name in ("snowball_porter", "snowball_danish",
                 "snowball_norwegian", "snowball_swedish"):
        assert name in STEMMERS
        assert index_stem("ab", name) == "ab"  # <=3 gate
        assert index_stem("12345", name) == "12345"  # digit gate
        assert query_stem("Abcd", name) == "Abcd"  # uppercase gate
    assert index_stem("motoring", "snowball_porter") == "motor"
    assert index_stem("kilometres", "snowball_danish") == "kilometr"


_GERMAN_CASES = [
    ('amorik', 'amor'),
    ('aäyjmitigznpc', 'aayjmitigznpc'),
    ('csjY', 'csjy'),
    ('djixzmrmlpbs', 'djixzmrmlpb'),
    ('esinömz', 'esinomz'),
    ('eßpna', 'esspna'),
    ('eüczö', 'euczo'),
    ('fmüuhoert', 'fmuuhoert'),
    ('fnrhomöü', 'fnrhomou'),
    ('hbßpuß', 'hbsspuss'),
    ('herväplöp', 'hervaplop'),
    ('ijügjbya', 'ijugjbya'),
    ('jambävö', 'jambavo'),
    ('jlrwqßkfyujä', 'jlrwqsskfyuja'),
    ('jpküqzt', 'jpkuqzt'),
    ('kapkeit', 'kapkeit'),
    ('kleiner', 'klein'),
    ('kleinü', 'kleinu'),
    ('kräge', 'krag'),
    ('lfryxwsßtmül', 'lfryxwssstmul'),
    ('lsern', 'lsern'),
    ('mcpbdlheßzywbs', 'mcpbdlhesszywb'),
    ('mhxvblöjpükä', 'mhxvblojpuka'),
    ('nwyzssfqy', 'nwyzssfqy'),
    ('ool', 'ool'),
    ('psvyeädqkßcedw', 'psvyeadqksscedw'),
    ('szüäkker', 'szuakk'),
    ('szüäkkü', 'szuakku'),
    ('tans', 'tan'),
    ('tzyclfovfhzus', 'tzyclfovfhzus'),
    ('wßsbckßfvu', 'wsssbckssfvu'),
    ('ypqrsma', 'ypqrsma'),
    ('ßoßlüfr', 'ssosslufr'),
    ('ägknzaözji', 'agknzaozji'),
    ('ärer', 'arer'),
    ('äsö', 'aso'),
    ('öhhgsorhüpsßßv', 'ohhgsorhupsssssv'),
    ('öhhilpgmbjes', 'ohhilpgmbj'),
    ('öiääqdxöxß', 'oiaaqdxoxss'),
    ('üvy', 'uvy'),
]

_GERMAN2_CASES = [
    ('agpfcgölvsngxc', 'agpfcgolvsngxc'),
    ('arddfwß', 'arddfwss'),
    ('cdqnfyä', 'cdqnfya'),
    ('cvoszddgqiöbj', 'cvoszddgqiobj'),
    ('eegaüö', 'eegauo'),
    ('ejbcbfdbak', 'ejbcbfdbak'),
    ('ekwolasblö', 'ekwolasblo'),
    ('epynrdcupgü', 'epynrdcupgu'),
    ('eßpner', 'esspn'),
    ('eßpnes', 'esspn'),
    ('gpcrkqonrß', 'gpcrkqonrss'),
    ('grandae', 'granda'),
    ('hslibläiaqäoyk', 'hsliblaiaqaoyk'),
    ('hyadeöf', 'hyadeof'),
    ('hünbnehtyvmtf', 'hunbnehtyvmtf'),
    ('jpepvoydaüäyz', 'jpepvoydauayz'),
    ('jsdvpöim', 'jsdvpoim'),
    ('jwänyrmr', 'jwanyrmr'),
    ('kböxmuxi', 'kboxmuxi'),
    ('kxszbsewvpemüy', 'kxszbsewvpemuy'),
    ('käwwvwzzjmkqx', 'kawwvwzzjmkqx'),
    ('lsheit', 'lsheit'),
    ('oagk', 'oagk'),
    ('ojaisßüoqlvßjä', 'ojaisssuoqlvssja'),
    ('räägsfyl', 'raagsfyl'),
    ('rönis', 'ronis'),
    ('skoloe', 'skolo'),
    ('ub', 'ub'),
    ('vennligik', 'vennlig'),
    ('wpm', 'wpm'),
    ('yqdadcfqp', 'yqdadcfqp'),
    ('yyüdvjxztvhnye', 'yyudvjxztvhny'),
    ('ßisldrpy', 'ssisldrpy'),
    ('ßqig', 'ssqig'),
    ('ßxlßaqvtvekxu', 'ssxlssaqvtvekxu'),
    ('äju', 'aju'),
    ('äjxtpvauh', 'ajxtpvauh'),
    ('äldlosöucx', 'aldlosoucx'),
    ('önpoa', 'onpoa'),
    ('öwopöß', 'owoposs'),
]

_DUTCH_CASES = [
    ('amoren', 'amor'),
    ('avjxkäréevnáè', 'avjxkareevnaè'),
    ('bily', 'bily'),
    ('ceüuvI', 'ceuuvi'),
    ('dormgem', 'dormgem'),
    ('dsj', 'dsj'),
    ('döogiy', 'doogiy'),
    ('edtäsywen', 'edtasyw'),
    ('ehëàä', 'eheàa'),
    ('fögha', 'fogha'),
    ('gaämö', 'gaamo'),
    ('gïqëynwqbmrïáy', 'giqeynwqbmriay'),
    ('hqiëb', 'hqieb'),
    ('husó', 'huso'),
    ('ibkê', 'ibkê'),
    ('isàjöhu', 'isàjohu'),
    ('jhàkênélàx', 'jhàkênelàx'),
    ('jüy', 'juy'),
    ('kapí', 'kapi'),
    ('przye', 'przye'),
    ('pè', 'pè'),
    ('qlïvnyr', 'qlivnyr'),
    ('urpaàöbvoöwva', 'urpaàobvoowva'),
    ('xnpémgkjiovy', 'xnpemgkjiovy'),
    ('zflöëegaf', 'zfloeegaf'),
    ('zéqndeï', 'zeqndei'),
    ('àcwégjonä', 'àcwegjona'),
    ('àïqhuesër', 'àiqhueser'),
    ('àïvxzáüökö', 'àivxzauoko'),
    ('àöänoèëyufnè', 'àoanoèeyufnè'),
    ('ädia', 'adia'),
    ('ätàx', 'atàx'),
    ('éw', 'ew'),
    ('ëgpäêrh', 'egpaêrh'),
    ('ëlsêöüêötéim', 'elsêouêoteim'),
    ('ëväêëze', 'evaêez'),
    ('ëàtaêolphä', 'eàtaêolpha'),
    ('ïrcl', 'ircl'),
    ('öhxwêépàywsêj', 'ohxwêepàywsêj'),
    ('öö', 'oo'),
]


@pytest.mark.parametrize("word,expected", _GERMAN_CASES)
def test_snowball_german_parity(word, expected):
    assert stem_snowball_german(word) == expected


@pytest.mark.parametrize("word,expected", _GERMAN2_CASES)
def test_snowball_german2_parity(word, expected):
    assert stem_snowball_german2(word) == expected


@pytest.mark.parametrize("word,expected", _DUTCH_CASES)
def test_snowball_dutch_parity(word, expected):
    assert stem_snowball_dutch(word) == expected


_FRENCH_CASES = [
    ('abcirons', 'abciron'),
    ('amorateur', 'amor'),
    ('arbejateurs', 'arbej'),
    ('arbejeuses', 'arbej'),
    ('bilie', 'bil'),
    ('bilissante', 'bil'),
    ('ecmèd', 'ecmed'),
    ('edtûçés', 'edtûc'),
    ('eôirai', 'eôir'),
    ('eôissant', 'eôiss'),
    ('eôés', 'eôé'),
    ('kapiqU', 'kapiqu'),
    ('przyive', 'przyiv'),
    ('taniront', 'tan'),
    ('tanée', 'tan'),
    ('tanît', 'tan'),
    ('thqihbimtèrl', 'thqihbimterl'),
    ('tôlgùûité', 'tôlgùûit'),
    ('uvwêùëera', 'uvwêùë'),
    ('xîéîûumûipewa', 'xîéîûumûipew'),
    ('ywbëassiez', 'ywbë'),
    ('zdocôiaux', 'zdocôial'),
    ('zdocôionn', 'zdocôion'),
    ('àëûyàldùuùé', 'àëûyàldùuù'),
    ('âkvjêâissants', 'âkvjêâiss'),
    ('èaôhi', 'èaôh'),
    ('êvçsehirais', 'êvçseh'),
    ('êvçsehissais', 'êvçseh'),
    ('ëxtplpIère', 'ëxtplpier'),
    ('ëxtplpiras', 'ëxtplpir'),
    ('ëxtplputions', 'ëxtplput'),
    ('ôriàôions', 'ôriàôion'),
    ('ôriàôistes', 'ôriàôist'),
    ('ûtiez', 'ûti'),
    ('a', 'a'),
    ('aa', 'aa'),
    ('aabil', 'aabil'),
    ('aabl', 'aabl'),
    ('aadvùôvuùj', 'aadvùôvuùj'),
    ('aai', 'aai'),
]

_SPANISH_CASES = [
    ('aberían', 'aber'),
    ('amoreremos', 'amor'),
    ('amorye', 'amory'),
    ('arbejaría', 'arbej'),
    ('bboxee', 'bboxe'),
    ('bilada', 'bil'),
    ('cantéis', 'cant'),
    ('cvtóbázén', 'cvtobazen'),
    ('eueríais', 'euer'),
    ('grandancias', 'grandanci'),
    ('husidas', 'hus'),
    ('husiríamos', 'hus'),
    ('husí', 'hus'),
    ('husías', 'hus'),
    ('jzdeibles', 'jzdeibl'),
    ('ocencia', 'ocenci'),
    ('przyaras', 'przyar'),
    ('tananza', 'tananz'),
    ('wbúuéfaecúápz', 'wbuuefaecuapz'),
    ('wüóear', 'wüo'),
    ('wüóeismo', 'wüoeism'),
    ('wüóeivo', 'wüoeiv'),
    ('wüóelo', 'wüoel'),
    ('yojfados', 'yojf'),
    ('yojfarían', 'yojf'),
    ('yévópó', 'yevop'),
    ('álwjóáxmüjrtúo', 'alwjoaxmüjrtu'),
    ('áóaüuw', 'aoaüuw'),
    ('évvaixífdtt', 'evvaixifdtt'),
    ('éártéqücíüwñb', 'earteqüciüwñb'),
    ('íutíeopéenk', 'iutieopeenk'),
    ('óxtplpat', 'oxtplpat'),
    ('óxtplpís', 'oxtplpis'),
    ('únhof', 'unhof'),
    ('a', 'a'),
    ('aa', 'aa'),
    ('aaackzwr', 'aaackzwr'),
    ('aabais', 'aabais'),
    ('aabil', 'aabil'),
    ('aad', 'aad'),
]

_ITALIAN_CASES = [
    ('abcvele', 'abcvel'),
    ('amelo', 'amel'),
    ('amoribile', 'amor'),
    ('amoró', 'amor'),
    ('aísw', 'aìsw'),
    ('bavo', 'bav'),
    ('canti', 'cant'),
    ('cantli', 'cantl'),
    ('edtésywavano', 'edtèsyw'),
    ('ehòàica', 'ehòàic'),
    ('ghwbópdíuò', 'ghwbòpdìu'),
    ('grandabile', 'grandabil'),
    ('granderono', 'grand'),
    ('grandeva', 'grand'),
    ('istèistè', 'istèist'),
    ('mléyìbàcwoxàd', 'mlèyìbàcwoxàd'),
    ('tancene', 'tancen'),
    ('vjîita', 'vjîit'),
    ('véîbéiòhgka', 'vèîbèiòhgk'),
    ('vóscéijîèósv', 'vòscèijîèòsv'),
    ('waheúégulvjìcn', 'waheùègulvjìcn'),
    ('wîìefríissero', 'wîìefr'),
    ('wîìefrímele', 'wîìefrìmel'),
    ('yèvícodéòp', 'yèvìcodèòp'),
    ('èbézitxjíùnc', 'èbèzitxjìùnc'),
    ('èdhodzeresti', 'èdhodz'),
    ('èàissero', 'èàisser'),
    ('éémmèú', 'èèmmèù'),
    ('ìxtplita', 'ìxtplit'),
    ('ùuzlîfwtèkógb', 'ùuzlîfwtèkògb'),
    ('úeh', 'ùeh'),
    ('úemelo', 'ùemel'),
    ('úrièúono', 'ùrièù'),
    ('úrièúvele', 'ùrièùvel'),
    ('a', 'a'),
    ('aa', 'aa'),
    ('aabil', 'aabil'),
    ('aar', 'aar'),
    ('aat', 'aat'),
    ('ababil', 'ababil'),
]

_PORTUGUESE_CASES = [
    ('aerem', 'aer'),
    ('arbejámos', 'arbej'),
    ('areiarei', 'arei'),
    ('cantadas', 'cant'),
    ('dormíamos', 'dorm'),
    ('dãôyupízúôíiga', 'dãôyupízúôíig'),
    ('edtõãareis', 'edtõã'),
    ('grandirias', 'grand'),
    ('kapermos', 'kap'),
    ('kleináreis', 'klein'),
    ('lkysaãõwõmç', 'lkysaãõwõmc'),
    ('lnõfazé', 'lnõfaz'),
    ('logías', 'logí'),
    ('mxgôeõderias', 'mxgôeõd'),
    ('mxgôeõdávamos', 'mxgôeõd'),
    ('przyaria', 'przyar'),
    ('przyerá', 'przyer'),
    ('siperá', 'sip'),
    ('skolesses', 'skol'),
    ('tanista', 'tanist'),
    ('tôlgúõado', 'tôlgúõ'),
    ('tôlgúõéreis', 'tôlgúõ'),
    ('uvwéúàira', 'uvwéúà'),
    ('uvwéúàosas', 'uvwéúà'),
    ('vennligirias', 'vennlig'),
    ('zdocôie', 'zdocôi'),
    ('ákvjéáeste', 'ákvjéá'),
    ('áreis', 'áre'),
    ('çzhqwhaócç', 'çzhqwhaócc'),
    ('évãseharas', 'évãseh'),
    ('ôriâôisse', 'ôriâô'),
    ('ôriâôo', 'ôriâô'),
    ('õharias', 'õhar'),
    ('õtimento', 'õtiment'),
    ('a', 'a'),
    ('aa', 'aa'),
    ('aabil', 'aabil'),
    ('aad', 'aad'),
    ('aador', 'aador'),
    ('aadvúôvuúj', 'aadvúôvuúj'),
]


@pytest.mark.parametrize("word,expected", _FRENCH_CASES)
def test_snowball_french_parity(word, expected):
    assert stem_snowball_french(word) == expected


@pytest.mark.parametrize("word,expected", _SPANISH_CASES)
def test_snowball_spanish_parity(word, expected):
    assert stem_snowball_spanish(word) == expected


@pytest.mark.parametrize("word,expected", _ITALIAN_CASES)
def test_snowball_italian_parity(word, expected):
    assert stem_snowball_italian(word) == expected


@pytest.mark.parametrize("word,expected", _PORTUGUESE_CASES)
def test_snowball_portuguese_parity(word, expected):
    assert stem_snowball_portuguese(word) == expected


_ROMANIAN_CASES = [
    ('abativa', 'abat'),
    ('abcură', 'abcur'),
    ('aita', 'ait'),
    ('amorez', 'amor'),
    ('amorosi', 'amor'),
    ('arămarăm', 'arăm'),
    ('aâre', 'aâr'),
    ('busem', 'bus'),
    ('canteşti', 'cant'),
    ('cantistă', 'cantist'),
    ('euanta', 'euant'),
    ('grandesc', 'grand'),
    ('husitiv', 'husit'),
    ('husiţiune', 'husit'),
    ('hțdanta', 'hțdant'),
    ('hțdară', 'hțdar'),
    ('hțditati', 'hțditat'),
    ('jzdeare', 'jzdear'),
    ('jzdeuse', 'jzdeus'),
    ('pfai', 'pfa'),
    ('pfâră', 'pfâr'),
    ('riârăute', 'riârăut'),
    ('vennligică', 'vennlig'),
    ('âdhodzabil', 'âdhodz'),
    ('âdhodzie', 'âdhodz'),
    ('âdhodzuserăm', 'âdhodz'),
    ('âdhodzâi', 'âdhodz'),
    ('âdhodzâseră', 'âdhodz'),
    ('âăseseşi', 'âăs'),
    ('âăâvgkqnsrdi', 'âăâvgkqnsrd'),
    ('îsehivitate', 'îseh'),
    ('șwiserăţi', 'șwi'),
    ('șxtplpele', 'șxtplpel'),
    ('șxtplpiuni', 'șxtplpiun'),
    ('a', 'a'),
    ('aa', 'aa'),
    ('aaackzwr', 'aaackzwr'),
    ('aab', 'aab'),
    ('aabil', 'aabil'),
    ('aai', 'aai'),
]

_CATALAN_CASES = [
    ('abcil', 'abc'),
    ('akmúèxz', 'akmuexz'),
    ('arbejaréis', 'arbej'),
    ("bil'ns", 'bil'),
    ('bilatòries', 'bil'),
    ('dormics', 'dormic'),
    ('edtçèeixen', 'edtçe'),
    ('epfüááis', 'epfu'),
    ('epfüáï', 'epfua'),
    ('ewvv·ajfhïèeèá', 'ewvv.ajfhieee'),
    ('jzde-te', 'jzde-t'),
    ('nïúáuéassin', 'niuaueassin'),
    ('sipència', 'sip'),
    ('skolaríeu', 'skol'),
    ('skolat', 'skol'),
    ('skolbles', 'skolb'),
    ('svè', 'sve'),
    ('taniren', 'tan'),
    ('uvwï·édre', 'uvwi.'),
    ('uvwï·éio', 'uvwi.'),
    ('vennligialismes', 'vennlig'),
    ('vscyójy', 'vscyojy'),
    ('ywbévos', 'ywbev'),
    ('zïfkèents', 'zifke'),
    ('zïfkèuts', 'zifke'),
    ('·dçíem', '.dçiem'),
    ('·eshífaü', '.eshifau'),
    ('àjúhed', 'ajuh'),
    ('àjúhió', 'ajuh'),
    ('àjúhïsques', 'ajuh'),
    ('àkvjïàíssims', 'akvji'),
    ('àújów', 'aujow'),
    ('éxtplpem', 'extplp'),
    ('úvdboboòs', 'uvdboboo'),
    ("'hi", "'hi"),
    ("'ho", "'ho"),
    ("'l", "'l"),
    ("'l'l", "'l'l"),
    ("'ls", "'ls"),
    ("'ls'ls", "'ls'ls"),
]

_RUSSIAN_CASES = [
    ('amorена', 'amorен'),
    ('aий', 'aи'),
    ('bilены', 'bilен'),
    ('bейте', 'bейт'),
    ('dormость', 'dormост'),
    ('grandете', 'grandет'),
    ('przyешь', 'przyеш'),
    ('przyую', 'przyу'),
    ('гщговитыла', 'гщговит'),
    ('дгуьтшцью', 'дгуьтшц'),
    ('жчгнвеа', 'жчгнве'),
    ('жчгнвеейте', 'жчгнве'),
    ('жчгнвеих', 'жчгнве'),
    ('жчгнвеия', 'жчгнве'),
    ('жчгнвеым', 'жчгнве'),
    ('ию', 'и'),
    ('йзулжих', 'йзулж'),
    ('мтгбифмдсй', 'мтгбифмдс'),
    ('нккгцфсъуерыо', 'нккгцфсъуеры'),
    ('плпеья', 'плпе'),
    ('уяхьтдего', 'уяхьтд'),
    ('щгняыякуей', 'щгняыяку'),
    ('щяекьете', 'щяекьет'),
    ('щяекьом', 'щяек'),
    ('щяекьсь', 'щяек'),
    ('щяекьуй', 'щяек'),
    ('ъдпеынн', 'ъдпеын'),
    ('ъдпеыся', 'ъдпе'),
    ('ъкую', 'ъку'),
    ('эткйькгы', 'эткйькг'),
    ('эцив', 'эц'),
    ('эцыл', 'эц'),
    ('язаувцужряи', 'язаувцужря'),
    ('ялуй', 'ял'),
    ('abcа', 'abcа'),
    ('abcам', 'abcам'),
    ('abcах', 'abcах'),
    ('abcв', 'abcв'),
    ('abcвш', 'abcвш'),
    ('abcвши', 'abcвши'),
]


@pytest.mark.parametrize("word,expected", _ROMANIAN_CASES)
def test_snowball_romanian_parity(word, expected):
    assert stem_snowball_romanian(word) == expected


@pytest.mark.parametrize("word,expected", _CATALAN_CASES)
def test_snowball_catalan_parity(word, expected):
    assert stem_snowball_catalan(word) == expected


@pytest.mark.parametrize("word,expected", _RUSSIAN_CASES)
def test_snowball_russian_parity(word, expected):
    assert stem_snowball_russian(word) == expected
