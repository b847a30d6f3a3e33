package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * The reference pipeline ingests survey text columns and defers all
  * analysis to downstream consumers; a 100 TB corpus pipeline needs these
  * in-engine. Everything here is a pure codegen'd projection or a single
  * map-side-combinable aggregation — no UDFs, no driver round-trips, and
  * each scales linearly with rows regardless of partition count.
  */
object TextAnalysis {

  /** Whitespace tokenization — the split shape shared by every operator
    * here (and by the DuckDB oracle's `string_split`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokens), as BIGINT for engine portability. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword count: count maximal letter-runs and digit-runs
    * ("abc123def" → 3). A deterministic, tokenizer-free approximation of
    * subword token counts, RE2-safe (no lookarounds) so the same pattern
    * runs in the DuckDB oracle.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+"), lit(0))).cast(LongType)

  /** English-ish stopword markers used by quality scoring and lang-ID. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is")
  val MarkersDe: Seq[String] = Seq("der", "die", "das", "und", "nicht", "ist")
  val MarkersEs: Seq[String] = Seq("el", "la", "los", "las", "es", "y", "que")

  private def countIn(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*))).cast(LongType)

  /** Quality-scoring features: char length, token count, mean token
    * length, punctuation ratio, stopword ratio. Ratios are DOUBLE and
    * deterministic (integer inputs, fixed op order).
    */
  def qualityFeatures(text: Column): Seq[Column] = {
    val nChars = length(text).cast(LongType)
    val nToks = tokenCount(text)
    Seq(
      nChars.as("q_chars"),
      nToks.as("q_tokens"),
      (nChars.cast(DoubleType) / nToks.cast(DoubleType)).as("q_mean_tok_len"),
      (length(regexp_replace(text, "[^.!?,;:]", "")).cast(DoubleType) /
        nChars.cast(DoubleType)).as("q_punct_ratio"),
      (countIn(text, StopwordsEn).cast(DoubleType) / nToks.cast(DoubleType))
        .as("q_stopword_ratio"))
  }

  /** Language-ID by marker-word voting (n-gram-free heuristic): count
    * marker hits per language (with multiplicity) and argmax with a fixed
    * tie-break order en > de > es. Pure projection — at 100 TB this is a
    * single scan with no shuffle.
    */
  def langId(text: Column): Column = {
    val en = countIn(text, StopwordsEn)
    val de = countIn(text, MarkersDe)
    val es = countIn(text, MarkersEs)
    // NULL text must classify as NULL: the marker counts are all null
    // there, every >= is null under three-valued logic, and the when
    // chain would FALL THROUGH to the otherwise branch — silently
    // labeling null documents "es"
    when(text.isNull, lit(null).cast("string"))
      .when(en >= de && en >= es, lit("en"))
      .when(de >= es, lit("de"))
      .otherwise(lit("es"))
  }

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased
    * text. The canonical exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    // collapse FIRST, trim second: Spark's trim strips only the space
    // character, so a leading/trailing tab or newline would survive the
    // pre-trim and become a leading/trailing SPACE in the canonical key
    // — documents identical up to a trailing newline (ubiquitous in
    // scraped corpora) would fingerprint apart
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** PII scrubbing: redact email addresses and bare URLs. RE2-safe
    * patterns (no lookarounds) so the DuckDB oracle applies the identical
    * regex; extend the pattern list per deployment's PII policy.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // \s, not a literal space: [^ ]+ would run PAST a newline/tab and
  // redact the adjacent word with the URL ("https://a.b\nhello" →
  // "<URL>" eating "hello") — corpus documents are full of newlines
  val UrlRe = "https?://[^\\s]+"

  /** URL canonicalization for crawl dedup — the normalization every
    * web-corpus pipeline runs before keying anything on a URL: strip the
    * fragment, lowercase scheme+authority, drop default ports (:80/:443),
    * drop `utm_*` tracking params (fixing the separators left behind),
    * and strip one trailing path slash. Pure `regexp_replace`/
    * `regexp_extract` chain — codegen'd, single scan, and every pattern
    * stays in the RE2-safe subset (no lookaround, no backrefs) so the
    * DuckDB oracle replays the identical chain. Param ORDER is preserved
    * (a sort would need a higher-order split/rebuild; crawl URLs from
    * one crawler emit params in stable order, so order-preserving
    * canonical keys still collapse the real duplicate classes).
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase ONLY scheme://authority; path/query keep their case
    val auth = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    // port strip is SCHEME-CONDITIONAL: :80 is only default for http,
    // :443 only for https — http://h:443 is a real distinct resource and
    // must NOT merge with http://h
    val authNoPort = when(auth.startsWith("http://"),
        regexp_replace(auth, ":80$", ""))
      .when(auth.startsWith("https://"), regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    // split path/query FIRST: '&' is a legal PATH character, so the utm
    // strips must run on the QUERY alone — '/a&utm_x/b' is a distinct
    // resource, not a tracking param ('path/?q' still collapses with
    // 'path?q' because the trailing-slash strip applies to the path)
    val path = regexp_extract(rest, "^[^?]*", 0)
    val qs = regexp_replace(rest, "^[^?]*", "")
    val noUtmMid = regexp_replace(qs, "&utm_[^&]*", "")
    val noUtmFirst = regexp_replace(noUtmMid, "\\?utm_[^&]*&", "?")
    val noUtm = regexp_replace(noUtmFirst, "\\?utm_[^&]*$", "")
    concat(authNoPort, regexp_replace(path, "/$", ""), noUtm)
  }

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), UrlRe, "<URL>")

  /** The remaining standard PII classes a production corpus pipeline
    * (CCNet/Dolma-style) redacts beyond email+URL, all RE2-safe (no
    * lookaround, no backrefs) so the DuckDB oracle replays them
    * verbatim. IPv4 only: dotted-quad with word boundaries. Phone:
    * optional +country code, then area(2–4)/exchange(exactly 3)/
    * line(exactly 4) digit groups with MANDATORY `[-. ]` separators
    * between groups (parens allowed on the area) and a `\b` anchoring
    * the bare-area form — the fixed group widths keep dates
    * ("2024-08-15", "1914-1918 1939") and equal-width numeric triplets
    * ("scores 100 200 300") out, and the leading `\b` keeps a match
    * from starting MID-digit-run ("12345-678-9012" falls through WHOLE —
    * unredacted, since its separated groups fit no class and the 9+-digit
    * fallback cannot see across separators — never shred to
    * "1<PHONE>"). International
    * formats that don't fit area/3/4 are deliberately out of scope:
    * their separator-less forms fall to the 9+-digit class, their
    * separated forms stay (precision over recall — a scrub pass must
    * not corrupt ordinary numeric text). Long digit runs (9+): account
    * numbers, SSNs-without-dashes, unformatted cards — and the
    * fallback for separator-less phones.
    */
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe =
    "(\\+\\d{1,3}[-. ]?)?(\\(\\d{2,4}\\)|\\b\\d{2,4})[-. ]\\d{3}[-. ]\\d{4}\\b"
  val LongDigitRe = "\\b\\d{9,}\\b"

  /** [[scrubPii]] extended to the full standard class set. ORDER is the
    * overlap-resolution policy and is load-bearing: email and URL first
    * (an email's digits or a URL's path-embedded phone/IP must redact as
    * part of the containing token, never shredded into `<PHONE>`
    * fragments inside a live URL), then IP before phone (a dotted quad's
    * octet pairs can otherwise half-match the phone groups), then phone
    * before the long-digit fallback (a separated phone is more specific
    * than "9+ digits"). One codegen'd regexp chain, single scan.
    */
  def scrubPiiV2(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(scrubPii(text), IpRe, "<IP>"),
        PhoneRe, "<PHONE>"),
      LongDigitRe, "<ID>")

  /** Word n-gram shingles of one document as an ARRAY column (with
    * multiplicity) — the narrow, per-row form of Dedup's shingle stream:
    * no explode, no shuffle, usable inside any projection. Documents with
    * fewer than `n` words yield an empty array. Native codegen kernel
    * ([[graft.functions.ShingleArray]] — one byte-range slice per
    * shingle); [[shingleArrayComposable]] is the built-in-ops form it is
    * property-tested equal to.
    */
  def shingleArray(text: Column, n: Int = 3): Column =
    graft.functions.ShingleArray(text, n)

  /** The composable (HOF) formulation of [[shingleArray]] — interpreted
    * per-element, ~10x slower on corpus scans; kept as the cross-check
    * the native kernel is property-tested against.
    */
  def shingleArrayComposable(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)))
      .otherwise(array())
  }

  /** Intra-document repetition ratio: the fraction of word n-grams that
    * are duplicates of an earlier n-gram in the SAME document
    * (1 - distinct/total) — the canonical "repetitious text" quality
    * signal for corpus filtering (documents dominated by boilerplate
    * loops score near 1). Pure narrow projection via array ops: at 100 TB
    * this is a single scan, no explode, no shuffle. NULL for documents
    * too short to have an n-gram.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = shingleArray(text, n)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast(DoubleType) /
        size(sh).cast(DoubleType))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Overlapping token-window chunks — the pretraining/RAG chunker:
    * windows of `size` tokens advancing by `size - overlap`, the last
    * window keeping the (shorter) tail; a document at or under `size`
    * tokens yields itself as one chunk. Pure narrow array projection —
    * chunking a 100 TB corpus is one scan, and the downstream explode
    * multiplies rows only by ~n_tokens/(size-overlap).
    */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val w = tokens(text)
    val nChunks = greatest(lit(1L),
      ceil((org.apache.spark.sql.functions.size(w) - lit(overlap))
        .cast(DoubleType) / step).cast(LongType))
    transform(sequence(lit(0L), nChunks - 1),
      i => concat_ws(" ", slice(w, (i * step + 1).cast("int"), lit(size))))
  }

  /** Remove repeated segments WITHIN a document (boilerplate paragraphs,
    * duplicated sentences — the intra-doc cousin of corpus-level dedup):
    * split on `sep`, keep each segment's FIRST occurrence in order, and
    * re-join. A document with no repeats round-trips byte-exact. Pure
    * narrow array projection — one corpus scan, no explode, no shuffle;
    * the first-occurrence test is array_position == own index (O(s²) in
    * the document's segment count, which is bounded and tiny next to the
    * scan). DuckDB mirror: `list_filter(l, (x,i) -> list_position(l,x)
    * = i)` (both engines' position are 1-based; Spark's lambda index is
    * 0-based, hence the +1).
    */
  def dedupSegments(text: Column, sep: String = ". "): Column = {
    val segs = split(text, java.util.regex.Pattern.quote(sep))
    array_join(
      filter(segs, (x, i) => array_position(segs, x) === i + lit(1L)), sep)
  }

  /** Cross-document boilerplate removal (the MassiveText/CCNet line-dedup
    * tier ABOVE [[dedupSegments]]'s intra-doc pass): a segment appearing
    * in at least `minDocs` DISTINCT documents is boilerplate (nav bars,
    * license footers, cookie banners) and is removed from EVERY document;
    * surviving segments keep their original order and joiner.
    *
    * Plan: one posexplode scan → distinct (doc, segment) → one
    * segment-keyed count (map-side combined, output ∝ segment vocabulary,
    * not corpus) → the boilerplate SET anti-joins back to the exploded
    * rows (no forced broadcast: the set of segments shared by ≥ minDocs
    * docs GROWS with the corpus — every common footer/greeting qualifies
    * — and forcing it past autoBroadcastJoinThreshold would OOM the
    * driver at corpus scale; AQE still broadcasts it when it actually
    * fits) → order-restoring collect_list rebuild per doc.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        sep: String = ". ", minDocs: Int = 3): DataFrame = {
    val segs = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "seg")))
    val boiler = segs
      .groupBy("seg").agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"))
    val kept = segs.join(boiler, Seq("seg"), "left_anti")
    val rebuilt = kept.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("seg")))).as("ps"))
      .select(col("id"),
        array_join(transform(col("ps"), p => p.getField("seg")), sep).as("clean"))
    // docs whose every segment was boilerplate must survive as EMPTY, not
    // vanish — left join from the full doc set
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("clean"), lit("")).as("clean"))
  }

  /** Truncate to the first `maxTokens` whitespace tokens (training-prep
    * length cap). Split→slice→re-join reproduces the original byte-exact
    * when under the cap (single-space join is the split's inverse,
    * empties preserved).
    */
  def truncateTokens(text: Column, maxTokens: Int): Column =
    concat_ws(" ", slice(tokens(text), 1, maxTokens))

  /** Per-document top-`k` terms by TF-IDF — the standard term-importance
    * / keyword-extraction op over a corpus (tf = term multiplicity in the
    * doc; idf = ln(N / doc-frequency), N = corpus row count). Scores are
    * rounded to 5dp BEFORE ranking so the rank order is reproducible
    * across engines (an ulp of ln() jitter must not flip ranks); ties
    * break lexicographically.
    *
    * Scale posture: tf is one (doc, term)-keyed shuffle of the token
    * stream with full map-side combine; df aggregates the distinct pairs
    * by term (vocabulary-sized result); the tf⋈df join keys on term —
    * all shuffles are keyed and skew-free for natural language (hot stop
    * words are large but bounded per-term groups). N is one map-side
    * count. The top-k window sorts per document only.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    // N rides as a broadcast 1-row aggregate (the unigramLogProb
    // pattern), NOT docs.count(): an eager count would execute the
    // whole upstream plan at CALL time and then re-execute it for the
    // token stream — double full-corpus cost when docs is a pipeline
    val nRow = docs.agg(count(lit(1)).cast(DoubleType).as("__n"))
    val tok = docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.select("id", "term").distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(nRow))
      .select(col("id"), col("term"),
        round(col("tf").cast(DoubleType) *
          log(col("__n") / col("df").cast(DoubleType)), 5).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** BM25 relevance of every document to a bag of query terms — the
    * standard lexical-retrieval score (Robertson/Spärck Jones; the
    * ranking half of every hybrid retrieval stack a training-data
    * pipeline uses to mine topical subsets):
    * score(D,Q) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl)),
    * IDF(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * Scale posture: the ONLY data-scale shuffle is the query-term-
    * filtered token stream keyed by (doc, term) — cost ∝ occurrences of
    * the query's terms, not the corpus (the isin filter runs inside the
    * explode's projection, so non-matching tokens never leave the map
    * side). Doc length rides the surviving rows (no corpus-sized length
    * join); df is |Q|-sized and broadcast; N and Σdl are one 1-row
    * broadcast aggregate. avgdl is computed as Σdl/N — an integer sum
    * and one IEEE division, bit-identical on any engine (avg()'s
    * accumulation order is engine-private). Per-term scores are
    * quantized to 9 dp and DECIMAL-summed per doc, so the per-doc total
    * is order-independent and hash-stable cross-engine (the q_pagerank
    * recipe). Output: (id, score DOUBLE) for every doc containing at
    * least one query term.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val stats = docs.agg(
      sum(tokenCount(col(textCol))).cast(DoubleType).as("__sumdl"),
      count(lit(1)).cast(DoubleType).as("__n"))
    val tok = docs.select(col(idCol).as("id"),
        tokenCount(col(textCol)).as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = tok.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("__sumdl") / col("__n")
    // (1 − b) folds in SCALA (exact for b=0.75); oracle SQL must write
    // the same folded literal, and every multiply in the same order —
    // one ulp of reassociation would diverge the hash
    val norm = lit(1 - b) + col("dl") * b / avgdl
    val idf = log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("id"),
        round(idf * (col("tf") * (k1 + 1)) / (col("tf") + norm * k1), 9)
          .cast("decimal(28,9)").as("__ts"))
      .groupBy(col("id"))
      .agg(sum(col("__ts")).as("__sd"))
      .select(col("id"), col("__sd").cast(DoubleType).as("score"))
  }

  /** Rolling polynomial fingerprint over token hashes, mod a 31-bit prime
    * (h_i = (h_{i-1} * 131 + hash(tok_i)) mod p). Order-sensitive — unlike
    * a bag-of-words hash it distinguishes permutations — and overflow-free
    * on engines with checked 64-bit arithmetic.
    */
  val FingerprintPrime = 1000000007L

  def fingerprintRolling(text: Column): Column =
    aggregate(
      transform(tokens(text), t => conv(substring(md5(t), 1, 8), 16, 10).cast(LongType)),
      lit(0L),
      (acc, h) => (acc * 131L + h) % FingerprintPrime)

  /** Canonical text form for fuzzy-exact dedup: lowercase, strip
    * everything but [a-z0-9 ], collapse whitespace runs, trim. Catches
    * the near-duplicates that differ only in case/punctuation/spacing —
    * the cheap first dedup tier before MinHash. Narrow, codegen'd; both
    * regexes behave identically under Java regex and RE2 (no
    * backreferences, no lookaround), so oracles agree.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Per-document unigram language-model log-likelihood — the classic
    * corpus-fit quality score (high = stereotypical text, very low =
    * noise/garbage; a perplexity proxy without an external model: the
    * corpus itself is the model, as in data-selection importance
    * sampling). For each document: n_tokens and the mean log2
    * probability of its tokens under the corpus unigram distribution.
    *
    * Scale posture: one token-keyed shuffle builds the vocabulary
    * (map-side combined; vocabulary-sized result), the corpus total is a
    * 1-row cross join (broadcast), and the score join keys tokens back
    * to the vocabulary — hot stop-word keys are bounded per-term groups,
    * and AQE splits any residual skew. No driver-side vocabulary, so a
    * 10^9-type vocabulary never needs to fit anywhere whole.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    tok.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        avg(log2(col("cnt").cast(DoubleType) / col("total").cast(DoubleType)))
          .as("mean_log2p"))
  }

  /** Adjacent-token bigrams of a document, each as "w1 w2" — a narrow
    * zip of the token array with its own tail (no explode here; callers
    * explode when they need the stream). A document under 2 tokens
    * yields an empty array.
    */
  def bigramArray(text: Column): Column = {
    val w = tokens(text)
    val n = org.apache.spark.sql.functions.size(w)
    zip_with(
      slice(w, lit(1), greatest(n - 1, lit(0))),
      slice(w, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Per-document mean log2 conditional bigram probability under the
    * corpus's own bigram model — the order-2 refinement of
    * [[unigramLogProb]] (the standard KenLM-style fluency proxy for data
    * selection, no external model needed): P(w2 | w1) = count(w1 w2) /
    * count(w1 as a bigram prefix). Documents under 2 tokens have no
    * bigrams and are absent from the output.
    *
    * Scale posture: the bigram vocabulary is one keyed shuffle of the
    * bigram stream with full map-side combine; prefix counts derive from
    * the VOCABULARY (bigram-types-sized, not corpus-sized) by a second
    * tiny agg, and the prefix join happens VOCAB-side — per-type
    * conditional log-prob is computed once per bigram type, so the
    * occurrence stream is shuffled exactly ONCE (by full bigram, a
    * near-uniform key) instead of a second pass keyed by prefix, whose
    * hot function-word keys ("the …", "of …") skew catastrophically at
    * corpus scale. AQE splits residual skew. Nothing corpus-sized
    * reaches the driver.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs.select(col(idCol).as("id"),
      explode(bigramArray(col(textCol))).as("bg"))
    val bgCnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val prefCnt = bgCnt
      .groupBy(substring_index(col("bg"), " ", 1).as("pref"))
      .agg(sum(col("cb")).as("cp"))
    // per-TYPE log2 P(w2|w1): identical doubles to computing it per
    // occurrence (same cb, cp inputs), at vocabulary cost
    val vocab = bgCnt
      .join(prefCnt, substring_index(col("bg"), " ", 1) === col("pref"))
      .select(col("bg"),
        log2(col("cb").cast(DoubleType) / col("cp").cast(DoubleType)).as("lp"))
    bg.join(vocab, Seq("bg"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        avg(col("lp")).as("mean_log2p"))
  }

  /** [[bigramLogProb]]'s 100 TB shuffle variant (the shape of the
    * hashed-gram substring dedup, Dedup `hashGrams`): every shuffle and
    * join keys on a fixed 8-byte BIGINT hash of the bigram — and of its
    * prefix word for the conditional denominator — instead of the
    * variable-length bigram STRING, so the occurrence shuffle carries
    * 16 bytes/row of key material and the sort-merge comparisons are
    * single long compares, not string compares. The hash is codegen'd
    * `xxhash64`, NOT the gram pipeline's md5 prefix: this variant shares
    * the exact form's oracle (answers are identical absent collisions —
    * the oracle never replays the hash), so engine portability buys
    * nothing and md5+conv would cost 4 hash evaluations per occurrence
    * across the plan's two uses of the stream (measured 2.3× slower at
    * ×64). A 64-bit collision (~2⁻⁶⁴ per pair) merges two bigram types'
    * counts — deterministic and vanishing at any real vocabulary; the
    * exact-string form stays the oracle anchor and a spec pins
    * hashed == exact on real data. `max("hp")` is safe: hp is
    * functionally dependent on hb up to the same collision odds.
    */
  def bigramLogProbHashed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the bigram string exists only inside this narrow projection —
    // nothing variable-length reaches a shuffle
    val bg = docs.select(col(idCol).as("id"),
        explode(bigramArray(col(textCol))).as("bgs"))
      .select(col("id"),
        xxhash64(col("bgs")).as("hb"),
        xxhash64(substring_index(col("bgs"), " ", 1)).as("hp"))
    val bgCnt = bg.groupBy(col("hb"))
      .agg(count(lit(1)).as("cb"), max(col("hp")).as("hp"))
    val prefCnt = bgCnt.groupBy(col("hp")).agg(sum(col("cb")).as("cp"))
    val vocab = bgCnt.join(prefCnt, Seq("hp"))
      .select(col("hb"),
        log2(col("cb").cast(DoubleType) / col("cp").cast(DoubleType)).as("lp"))
    bg.select(col("id"), col("hb")).join(vocab, Seq("hb"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        avg(col("lp")).as("mean_log2p"))
  }

  /** Per-document lexical-diversity stats: token count, distinct-token
    * count, type-token ratio, and Shannon entropy (bits) of the
    * document's own token distribution — the vocabulary-richness /
    * degeneracy signals (spam and template pages score near 0 entropy).
    *
    * Entropy in one aggregation pass via H = log2(n) − Σ c·log2(c) / n,
    * so no per-document second scan is needed. One (id, token)-keyed
    * shuffle with map-side combine, then an id-keyed rollup — both
    * partition cleanly at any corpus size.
    */
  def lexicalStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokCnt = docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
    tokCnt.groupBy(col("id"))
      .agg(sum(col("c")).cast(LongType).as("n_tokens"),
        count(lit(1)).cast(LongType).as("n_types"),
        sum(col("c").cast(DoubleType) * log2(col("c").cast(DoubleType))).as("__clc"))
      .select(col("id"), col("n_tokens"), col("n_types"),
        (col("n_types").cast(DoubleType) / col("n_tokens").cast(DoubleType)).as("ttr"),
        (log2(col("n_tokens").cast(DoubleType)) -
          col("__clc") / col("n_tokens").cast(DoubleType)).as("entropy"))
  }

  /** Per-stratum distribution drift: KL(P_stratum ‖ P_corpus) in bits
    * between each stratum's unigram token distribution and the whole
    * corpus's — the mixture-monitoring signal that flags a source whose
    * language shifted (scraper broke, new spam campaign, domain drift)
    * without any external model.
    *
    * Scale posture: one (stratum, token)-keyed shuffle with map-side
    * combine builds the per-stratum vocabulary; the corpus distribution
    * and per-stratum totals derive from THAT (vocabulary-sized, not
    * corpus-sized); the score join keys on token. KL is exact (every
    * stratum term occurs in the corpus by construction, so no smoothing
    * is needed).
    */
  def domainKl(docs: DataFrame, strataCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(strataCol).as("stratum"),
      explode(tokens(col(textCol))).as("tok"))
    val byStratum = tok.groupBy(col("stratum"), col("tok"))
      .agg(count(lit(1)).as("cs"))
    val stratumTotals = byStratum.groupBy(col("stratum")).agg(sum(col("cs")).as("ns"))
    val corpus = byStratum.groupBy(col("tok")).agg(sum(col("cs")).as("cc"))
    val total = corpus.agg(sum(col("cc")).as("nc"))
    val ps = col("cs").cast(DoubleType) / col("ns").cast(DoubleType)
    val pc = col("cc").cast(DoubleType) / col("nc").cast(DoubleType)
    byStratum.join(corpus, Seq("tok"))
      .join(stratumTotals, Seq("stratum"))
      .crossJoin(broadcast(total))
      .groupBy(col("stratum"))
      .agg(first(col("ns")).cast(LongType).as("n_tokens"),
        sum(ps * log2(ps / pc)).as("kl_bits"))
  }

  /** Reassemble exploded chunks back into documents in chunk order — the
    * inverse of [[chunks]] at overlap=0, and the general shuffle-safe
    * ordered concat (shard merging, ordered string_agg). `collect_list`
    * alone is partition-order-nondeterministic, so each chunk is carried
    * with its position and the array is sorted AFTER collection:
    * determinism costs one per-group array sort of the group's own
    * chunks, never a global sort.
    */
  def reassembleChunks(chunked: DataFrame, idCol: String, posCol: String,
                       chunkCol: String, sep: String = " "): DataFrame =
    chunked.groupBy(col(idCol).as("id"))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(posCol).cast(LongType).as("p"),
              col(chunkCol).as("c")))),
            x => x.getField("c")),
          sep).as("text"))

  /** Data-card summary — the release-note stat block for a corpus drop:
    * doc/token/char totals, source+language breadth, English share, and
    * the exact normalization-level dup rate — as `(metric, value)` rows.
    * Input needs the documents schema (`text`, `n_chars`, `lang`,
    * `source`). ONE corpus scan feeds one multi-distinct aggregate
    * (Spark plans the 3 DISTINCTs as one Expand pass; at 100 TB swap the
    * exact distincts for approx_count_distinct, same shape); the 1-row
    * aggregate explodes into the row-per-metric card — no second scan.
    *
    * Ratios go through `try_divide`: on an EMPTY corpus (a new date
    * partition, a filter that matched nothing) the global agg yields one
    * row with n_docs = 0, and ANSI `/` would throw DIVIDE_BY_ZERO — the
    * same hazard class as the r10 corr() sweep finding. try_divide
    * reports the count metrics as 0 and the ratio metrics as NULL,
    * which is also exactly DuckDB's division-by-zero result, so the two
    * engines agree on the degenerate domain too (BehaviorSpec pins the
    * empty corpus).
    */
  def dataCard(docs: DataFrame): DataFrame =
    docs.select(
        tokenCount(col("text")).as("nt"),
        col("n_chars"), col("lang"), col("source"),
        md5(normalizeText(col("text"))).as("nk"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        sum("n_chars").as("n_chars_total"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("nk")).as("n_unique"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      .select(explode(array(
        struct(lit("dup_rate").as("metric"),
          round(lit(1.0) - expr("try_divide(CAST(n_unique AS DOUBLE), n_docs)"), 4).as("value")),
        struct(lit("mean_doc_tokens").as("metric"),
          round(expr("try_divide(CAST(n_tokens AS DOUBLE), n_docs)"), 4).as("value")),
        struct(lit("n_chars_total").as("metric"), col("n_chars_total").cast(DoubleType).as("value")),
        struct(lit("n_docs").as("metric"), col("n_docs").cast(DoubleType).as("value")),
        struct(lit("n_langs").as("metric"), col("n_langs").cast(DoubleType).as("value")),
        struct(lit("n_sources").as("metric"), col("n_sources").cast(DoubleType).as("value")),
        struct(lit("n_tokens").as("metric"), col("n_tokens").cast(DoubleType).as("value")),
        struct(lit("pct_en").as("metric"),
          round(expr("try_divide(CAST(n_en AS DOUBLE), n_docs)"), 4).as("value")))).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
      .orderBy("metric")

  /** Model-based quality scoring: a hashed linear classifier over
    * lowercased whitespace unigrams — the SERVING shape of the
    * fastText-style quality filters every production curation stack runs
    * (CCNet's LM filter, DCLM/FineWeb-Edu's classifier gates). Each
    * token hashes to one of `dim` buckets (md5-prefix, the engine-
    * portable idiom shared with the split/sketch ops) and each bucket
    * carries a weight; the document's margin is the mean bucket weight
    * and the keep/drop decision is `margin > 0`. Weights here derive
    * deterministically from `md5(seed ":" bucket)` — a stand-in for
    * trained coefficients (no model artifacts ship in this sandbox);
    * swapping trained weights in is a broadcast weight-table join or a
    * regenerated literal map, and the plan shape — one codegen'd
    * projection, no explode, no shuffle, no UDF — is identical.
    *
    * Determinism is EXACT, not round-5-absorbed: every weight is
    * hex32/2^32*2−1 for a 32-bit md5 prefix hex32, i.e. an exact
    * multiple of 2⁻³¹ in [−1, 1). A document's weight sum therefore has
    * every partial sum on the 2⁻³¹ grid with |sum| < n_tokens, which a
    * double's 53-bit significand represents exactly for any corpus-
    * plausible n (< 2²¹ tokens) — ADDITION NEVER ROUNDS, so the fold
    * order cannot matter and Spark's left fold equals DuckDB's list_sum
    * bit-for-bit. The margin is one correctly-rounded IEEE division of
    * identical operands — also bit-exact. No sigmoid: the monotone
    * transform adds a libm-vs-StrictMath ulp hazard and changes no
    * decision, so the operator emits the raw margin.
    *
    * Served by the fused native expression (graft.functions.
    * HashedLinearMargin) with the stand-in table materialized once on
    * the driver: the HOF reference form below pays TWO interpreted md5 +
    * hex-conv chains per token (one for the bucket, one re-deriving the
    * bucket's weight); exactness makes the two constructions bit-equal
    * (ExtensionsSpec pins it).
    */
  def hashedClassifierMargin(text: Column, dim: Int = 4096,
                             seed: String = "qclf"): Column =
    graft.functions.HashedLinearMargin(text, hashedClassifierWeights(dim, seed))

  /** Composable HOF reference formulation of [[hashedClassifierMargin]]
    * — what the native kernel is verified against (the cosineHof
    * pattern); derives each bucket's weight inline from the seed rather
    * than a table.
    */
  private[graft] def hashedClassifierMarginHof(text: Column, dim: Int = 4096,
                                               seed: String = "qclf"): Column = {
    val toks = tokens(lower(text))
    def weight(b: Column): Column =
      conv(substring(md5(concat(lit(seed + ":"), b.cast("string"))), 1, 8), 16, 10)
        .cast(DoubleType) / lit(4294967296.0) * lit(2.0) - lit(1.0)
    aggregate(toks, lit(0.0), (acc, t) => acc + weight(classifierBucket(t, dim))) /
      size(toks).cast(DoubleType)
  }

  private def classifierBucket(t: Column, dim: Int): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast(LongType) % dim.toLong

  /** The md5-derived stand-in weight table as a driver-side array —
    * exactly the doubles [[hashedClassifierMargin]]'s expression derives
    * per token (the arithmetic is EXACT at every step, so the two
    * constructions agree bit-for-bit; the spec pins it).
    */
  def hashedClassifierWeights(dim: Int = 4096,
                              seed: String = "qclf"): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { b =>
      val h = md.digest(s"$seed:$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16) / 4294967296.0 * 2.0 - 1.0
    }
  }

  /** [[hashedClassifierMargin]] SERVING a trained weight table: the
    * weights arrive as a plain array (from any offline trainer) and ride
    * the native kernel as an expression-held double[], so scoring stays
    * ONE codegen'd projection — per token, hash → array read — with no
    * explode, no join, no shuffle. This is the swap the X169 row
    * promises: replace the md5 stand-ins with trained coefficients and
    * NOTHING about the plan changes; the spec proves it by serving the
    * stand-in table through this path and matching
    * [[hashedClassifierMargin]] bit-for-bit.
    */
  def hashedClassifierMarginFrom(text: Column,
                                 weights: Array[Double]): Column =
    graft.functions.HashedLinearMargin(text, weights)
}
