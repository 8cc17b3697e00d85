package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-transcript (SFT / post-training) operations — conversation
  * datasets are the instruction-tuning sibling of the pretrain corpus,
  * and they arrive as JSON message arrays in the OpenAI `messages`
  * shape: `[{"role": "...", "content": "..."}, …]`. Before packing or
  * loss-masking, a pipeline validates STRUCTURE (known roles, system
  * prompt only at the head, strict user/assistant alternation ending
  * on assistant), computes turn statistics (the assistant-character
  * mass is the loss-bearing budget), and flattens to a trainable
  * role-tagged text.
  *
  * Everything is per-row: one `from_json` + higher-order array
  * functions — no shuffle, no state, streams. Malformed JSON parses to
  * NULL (`parsed = false`) rather than failing the batch; the
  * VALIDATION verdicts are how a job routes those to quarantine. The
  * DuckDB oracle replays the same verdicts from the raw JSON via
  * per-index `json_extract_string` (gate `q_chat_stats`). */
object Chat {

  /** The OpenAI message-array shape. Extra fields are ignored by
    * `from_json`; absent fields are NULL. */
  val MessageSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  val KnownRoles: Seq[String] = Seq("system", "user", "assistant")

  private def msgs(json: Column): Column = from_json(json, MessageSchema)

  /** Structure + statistics per transcript:
    *  - `parsed`: the JSON parsed as a message array
    *  - `n_turns` / `n_assistant`
    *  - `assistant_chars`: total assistant content codepoints — the
    *    loss-bearing budget a packer sizes against
    *  - `roles_valid`: every role known AND every content non-null
    *  - `alternation_valid`: optional single leading system message,
    *    then STRICT user/assistant alternation starting at user and
    *    ending at assistant (⟺ even body length), system nowhere else
    * All NULL when unparsed. */
  def stats(df: DataFrame, jsonCol: String): DataFrame = {
    val m = msgs(col(jsonCol))
    val n = size(m)
    val hasSys = n >= 1 && element_at(m, 1).getField("role") === "system"
    val off = when(hasSys, 1).otherwise(0)
    val bodyN = n - off
    val sysOnlyAtHead = forall(
      transform(m, (msg, i) => msg.getField("role") =!= "system" || i === 0),
      c => c)
    val bodyAlternates = forall(
      transform(m, (msg, i) =>
        i < off || (msg.getField("role") ===
          when(pmod(i - off, lit(2)) === 0, "user").otherwise("assistant"))),
      c => c)
    df.withColumn("__m", m)
      .withColumn("parsed", col("__m").isNotNull)
      .withColumn("n_turns", size(col("__m")))
      .withColumn("n_assistant",
        size(filter(col("__m"), x => x.getField("role") === "assistant")))
      .withColumn("assistant_chars",
        aggregate(filter(col("__m"), x => x.getField("role") === "assistant"),
          lit(0L), (acc, x) =>
            acc + coalesce(length(x.getField("content")).cast("long"), lit(0L))))
      .withColumn("roles_valid",
        forall(col("__m"), x =>
          x.getField("role").isin(KnownRoles: _*) &&
            x.getField("content").isNotNull))
      .withColumn("alternation_valid", when(col("__m").isNotNull,
        sysOnlyAtHead && bodyN >= 2 && pmod(bodyN, lit(2)) === 0 &&
          bodyAlternates))
      .drop("__m")
  }

  /** Role-tagged flattening: `<|role|>content` per turn, newline-
    * joined — the trainable text a tokenizer/packer consumes. NULL for
    * unparsed rows. */
  def flatten(df: DataFrame, jsonCol: String,
              outCol: String = "flat_text"): DataFrame =
    df.withColumn(outCol,
      array_join(transform(msgs(col(jsonCol)), x =>
        concat(lit("<|"), x.getField("role"), lit("|>"),
          coalesce(x.getField("content"), lit("")))), "\n"))

  /** LOSS-MASK spans: the half-open codepoint ranges `[s, e)` of each
    * assistant turn's content inside [[flatten]]'s output — an SFT
    * trainer masks loss to exactly these. Computed by one prefix-sum
    * fold over the message array (`aggregate`), per row, no shuffle;
    * offsets are codepoints, matching SQL `length`/`substr`, so
    * `substr(flat_text, s+1, e-s)` is the assistant content verbatim
    * (unit-pinned). Output column `assistant_spans`:
    * `array<struct<s,e>>`, NULL for unparsed rows, empty when no
    * assistant turn. */
  def assistantSpans(df: DataFrame, jsonCol: String,
                     outCol: String = "assistant_spans"): DataFrame = {
    val empty = array().cast("array<struct<s:bigint,e:bigint>>")
    val fold = aggregate(msgs(col(jsonCol)),
      struct(lit(0L).as("pos"), empty.as("spans")),
      (acc, x) => {
        // "<|" + role + "|>" = role length + 4; "\n" terminates a turn
        val tagLen = length(x.getField("role")).cast("long") + 4L
        val cLen = coalesce(length(x.getField("content")).cast("long"),
          lit(0L))
        val start = acc.getField("pos") + tagLen
        struct(
          (start + cLen + 1L).as("pos"),
          when(x.getField("role") === "assistant",
            concat(acc.getField("spans"),
              array(struct(start.as("s"), (start + cLen).as("e")))))
            .otherwise(acc.getField("spans")).as("spans"))
      },
      acc => acc.getField("spans"))
    df.withColumn(outCol, fold)
  }

  /** Preference-pair construction (reward-model / DPO data prep): per
    * prompt, the top- and bottom-scored responses become (chosen,
    * rejected) with their margin. Deterministic tie-breaks — chosen
    * ties resolve to the LOWEST id, rejected ties to the HIGHEST — so
    * a tied group still yields a stable, distinct pair; single-
    * response prompts yield nothing (no contrast to learn from).
    * One narrow aggregation: min/max of (score, ±id, response)
    * structs, map-side combinable, responses ride the agg — no window
    * sort, no self-join. `idCol` must be unique and non-null. */
  def preferencePairs(df: DataFrame, promptCol: String, responseCol: String,
                      scoreCol: String, idCol: String): DataFrame = {
    Seq(promptCol, responseCol, scoreCol, idCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    df.groupBy(col(promptCol))
      .agg(
        max(struct(col(scoreCol).as("score"), (-col(idCol)).as("nid"),
          col(responseCol).as("r"))).as("__c"),
        min(struct(col(scoreCol).as("score"), (-col(idCol)).as("nid"),
          col(responseCol).as("r"))).as("__r"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col(promptCol),
        col("__c.r").as("chosen"), col("__r.r").as("rejected"),
        (col("__c.score") - col("__r.score")).as("margin"))
  }
}
