"""Arithmetic-coded pregen string packings.

The reference's pregen writer offers four arithmetic-coded field
types beside the radix packings (indexer_param_block_pregen.c:48-66):
``base32arith``, ``base37arith``, ``asciiprintablesarith`` and
``asciiprintablesarithbigram``.  Each codes the (lowercased,
space-collapsed, encoder-mapped) character stream of the field with a
16-bit-window arithmetic coder into the top bits of one fixed-width
integer, so that fields with more probable characters keep more
distinguishing prefix characters than a plain radix packing —
order-preserving within the model.

Faithful pieces, all replicated here bit-for-bit:

- coder window constants (arithmetic_coding.h:17-21): 16 code-value
  bits, Top_value 0xFFFF, First_qtr/Half/Third_qtr quarters;
- the encoder (arithmetic_coding_encoder.h:50-120): underflow-bit
  follow counter, MSB-first buffer fill, ``done()`` flushing with
  symbol 0 then returning ``T_max - buffer`` (the inversion that makes
  more-probable-prefix strings sort HIGHER, matching the radix
  packings' descending-rsv convention);
- the models (arithmetic_model_unigram.c, arithmetic_model_bigram.c):
  ``cfreq[i] = sum(freq[i:])`` suffix-cumulative tables, MAX_FREQUENCY
  16383 cap with ``(freq+1)/2`` halving, and the bigram's
  previous-symbol+1 context chain with context 0 = start-of-string.
  The pregen writer instantiates every model NON-adaptively over fixed
  tables (pregen_writer_normal.h init_models()) — that is what makes
  the encode a pure per-row function, embarrassingly parallel in one
  Arrow pass with the model broadcast by closure;
- the field walk (pregen_writer_normal.c:181-238 generate_arithmetic):
  lowercase, per-byte encode under the scheme's character encoder,
  skip unencodable bytes, collapse space runs, ignore leading spaces,
  stop once the buffer is full, bump all-zero results to 1.

Default models are the reference's own shipped tables
(:mod:`atire_spark.kernels.arith_tables`); corpus-trained tables come
from :func:`counts_to_freqs` over distributed symbol counts (the
tools/arithmetic_encoding_model_gen.c analogue — see
:func:`atire_spark.pregen.train_arith_model`).

``bits`` follows the module convention of kernels/pregen.py: the
reference's ``ANT_pregen_t`` is a compile-time width (pregen_t.h:9-13,
stock 64); the Spark layer compiles for 63 so scores fit a BIGINT,
and the compiled-reference A/B runs this kernel at 64.
"""

from __future__ import annotations

from atire_spark.kernels.pregen import (
    CHAR_ENCODE_FAIL,
    RADIX_SCHEMES,
    normalize_lowercase,
)

__all__ = [
    "ARITH_SCHEMES",
    "ArithModel",
    "default_model",
    "encode_arith",
    "counts_to_freqs",
    "symbol_stream",
]

MAX_FREQUENCY = 16383
TOP_VALUE = (1 << 16) - 1
FIRST_QTR = TOP_VALUE // 4 + 1
HALF = 2 * FIRST_QTR
THIRD_QTR = 3 * FIRST_QTR

#: arith type name -> (radix scheme supplying the character encoder,
#: bigram?) per pregen_writer_normal.c:256-268
ARITH_SCHEMES = {
    "base32arith": ("base32", False),
    "base37arith": ("base37", False),
    "asciiprintablesarith": ("asciiprintables", False),
    "asciiprintablesarithbigram": ("asciiprintables", True),
}


class ArithModel:
    """Symbol-frequency model, unigram or bigram.

    ``freqs`` is ``nsym`` counts (unigram) or ``(nsym+1) * nsym``
    counts context-major (bigram, context 0 = start of string).  The
    suffix-cumulative ``cfreq`` rows replicate the reference's
    constructors; every count must be >= 1 (the reference's tables
    are, and a zero-mass symbol would stall the coder).
    """

    def __init__(self, nsym: int, freqs, bigram: bool = False, adapt: bool = False):
        freqs = list(freqs)
        contexts = nsym + 1 if bigram else 1
        if len(freqs) != contexts * nsym:
            raise ValueError(
                f"model wants {contexts * nsym} frequencies, got {len(freqs)}"
            )
        if min(freqs) < 1:
            raise ValueError("all symbol frequencies must be >= 1")
        self.nsym = nsym
        self.bigram = bigram
        self.adapt = adapt
        self.freq = [freqs[c * nsym : (c + 1) * nsym] for c in range(contexts)]
        self.cfreq = [self._suffix_sums(row) for row in self.freq]
        for row in self.cfreq:
            if row[0] > MAX_FREQUENCY:
                raise ValueError(
                    "arithmetic coder model max frequency exceeded "
                    f"({row[0]} > {MAX_FREQUENCY})"
                )
        self.ctx = 0

    @staticmethod
    def _suffix_sums(freq_row):
        out = [0] * (len(freq_row) + 1)
        for i in range(len(freq_row) - 1, -1, -1):
            out[i] = out[i + 1] + freq_row[i]
        return out

    def clear_context(self) -> None:
        self.ctx = 0

    def _update_context(self, sym: int) -> None:
        """update_context (arithmetic_model_bigram.c:100-119) /
        unigram update body (:113-137): halve at the cap, then bump."""
        freq, cfreq = self.freq[self.ctx], self.cfreq[self.ctx]
        if cfreq[0] == MAX_FREQUENCY:
            cum = 0
            cfreq[self.nsym] = 0
            for i in range(self.nsym - 1, -1, -1):
                freq[i] = (freq[i] + 1) // 2
                cum += freq[i]
                cfreq[i] = cum
        freq[sym] += 1
        for i in range(sym, -1, -1):
            cfreq[i] += 1

    def update(self, sym: int) -> None:
        if self.bigram:
            if self.adapt:
                # order-2 context, then the order-1 (start) context
                self._update_context(sym)
                if self.ctx != 0:
                    self.ctx = 0
                    self._update_context(sym)
            self.ctx = sym + 1
        elif self.adapt:
            self._update_context(sym)


def default_model(field_type: str) -> ArithModel:
    """The reference's shipped non-adaptive model for an arith type
    (pregen_writer_normal.h init_models())."""
    from atire_spark.kernels import arith_tables as t

    scheme, bigram = ARITH_SCHEMES[field_type]
    nsym = RADIX_SCHEMES[scheme][0]
    table = {
        "base32arith": t.FREQ_BASE32,
        "base37arith": t.FREQ_BASE37,
        "asciiprintablesarith": t.FREQ_ASCII_PRINTABLES,
        "asciiprintablesarithbigram": t.FREQ_ASCII_PRINTABLES_BIGRAM,
    }[field_type]
    return ArithModel(nsym, table, bigram=bigram)


def symbol_stream(field: str, scheme: str, collapse_spaces: bool = True):
    """The field's encoded-symbol sequence: normalize-lowercase
    (unicode.c:213-257), per-UTF-8-byte encode, skip failures; with
    ``collapse_spaces`` (the writer's walk,
    pregen_writer_normal.c:195-222) space runs collapse and leading
    spaces drop — without (the model-gen tool's walk,
    tools/arithmetic_encoding_model_gen.c:225-252) every encodable
    character counts."""
    _, enc = RADIX_SCHEMES[scheme]
    enc_space = enc(0x20)
    prev_space = True
    out = []
    for ch in field or "":
        for b in normalize_lowercase(ch).encode("utf-8"):
            e = enc(b)
            if e == CHAR_ENCODE_FAIL:
                continue
            if collapse_spaces:
                if e == enc_space:
                    if prev_space:
                        continue
                    prev_space = True
                else:
                    prev_space = False
            out.append(e)
    return out


def encode_arith(
    field: str,
    field_type: str,
    model: ArithModel | None = None,
    bits: int = 63,
) -> int:
    """generate_arithmetic (pregen_writer_normal.c:181-238) over the
    given (default: reference-shipped) model."""
    scheme, _ = ARITH_SCHEMES[field_type]
    if model is None:
        model = default_model(field_type)
    model.clear_context()  # encoder ctor (arithmetic_coding_encoder.h:52)

    tmax = (1 << bits) - 1
    low, high = 0, TOP_VALUE
    fbits = 0
    buffer = 0
    bits_to_go = bits

    def output_bit(bit: int) -> None:
        nonlocal buffer, bits_to_go
        if bits_to_go > 0:
            buffer = (buffer << 1) | bit
            bits_to_go -= 1

    def bit_plus_follow(bit: int) -> None:
        nonlocal fbits
        output_bit(bit)
        while fbits > 0:
            output_bit(1 - bit)
            fbits -= 1

    def encode_symbol(sym: int) -> bool:
        nonlocal low, high, fbits
        cfreq = model.cfreq[model.ctx]
        rng = high - low + 1
        high = low + (rng * cfreq[sym]) // cfreq[0] - 1
        low = low + (rng * cfreq[sym + 1]) // cfreq[0]
        while True:
            if high < HALF:
                bit_plus_follow(0)
            elif low >= HALF:
                bit_plus_follow(1)
                low -= HALF
                high -= HALF
            elif low >= FIRST_QTR and high < THIRD_QTR:
                fbits += 1
                low -= FIRST_QTR
                high -= FIRST_QTR
            else:
                break
            low *= 2
            high = high * 2 + 1
        model.update(sym)
        return bits_to_go > 0

    for sym in symbol_stream(field, scheme):
        if not encode_symbol(sym):
            break

    # done() (arithmetic_coding_encoder.h:65-77)
    while bits_to_go:
        encode_symbol(0)
    fbits += 1
    bit_plus_follow(0 if low < FIRST_QTR else 1)
    result = tmax - buffer

    return result if result else 1


def counts_to_freqs(counts, nsym: int, bigram: bool = False):
    """Turn distributed symbol counts into a model table — the
    arithmetic_encoding_model_gen.c analogue.

    The tool trains an ADAPTIVE model from all-ones, one ``update``
    per encoded character with mid-stream ``(freq+1)/2`` halvings at
    the MAX_FREQUENCY cap, then renders the final counts.  A
    distributed count can't replay that order-dependent stream, so we
    take the exact counts (one shuffle of <= (nsym+1)*nsym rows) and
    apply the same halving arithmetic at the end until every context
    fits the cap — the same model family, same cap, same floor of 1
    per symbol; documented divergence: halvings happen once at the
    end, not mid-stream.

    ``counts`` maps symbol (unigram) or ``ctx * nsym + symbol``
    (bigram, ctx 0 = start of string) to occurrence count.
    """
    contexts = nsym + 1 if bigram else 1
    freqs = [1] * (contexts * nsym)
    for key, n in counts.items():
        freqs[int(key)] += int(n)
    for c in range(contexts):
        row = freqs[c * nsym : (c + 1) * nsym]
        while sum(row) > MAX_FREQUENCY:
            row = [(f + 1) // 2 for f in row]
        freqs[c * nsym : (c + 1) * nsym] = row
    return tuple(freqs)
