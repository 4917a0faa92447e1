package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Code-corpus curation: license detection over document text — the
 * gate every code-corpus drop (the-Stack-style pipelines) passes
 * before training: permissively-licensed files keep, copyleft
 * quarantines, unknown routes to review. Detection is a priority
 * cascade of codegen `rlike` probes over the text HEAD (license
 * notices live in file headers), scan-local with no shuffle; the
 * priority order makes a file carrying both GPL and MIT text
 * quarantine, never keep.
 */
object CodeCorpus {

  /** (spdx id, family, detection regex, canonical notice text) in
    * PRIORITY order — copyleft before weak copyleft before
    * permissive, so multi-license files resolve conservatively. The
    * canonical notice is what fixtures prepend; the regex must
    * rediscover it (and its real-world paraphrases). */
  val Licenses: Seq[(String, String, String, String)] = Seq(
    ("AGPL-3.0", "copyleft",
      "GNU Affero General Public License",
      "under the terms of the GNU Affero General Public License as published"),
    ("GPL-3.0", "copyleft",
      "GNU General Public License.{0,60}version 3",
      "under the terms of the GNU General Public License, either version 3 of the License"),
    ("GPL-2.0", "copyleft",
      "GNU General Public License.{0,60}version 2",
      "under the terms of the GNU General Public License, version 2 of the License"),
    ("LGPL-2.1", "weak-copyleft",
      "GNU Lesser General Public License",
      "under the terms of the GNU Lesser General Public License as published"),
    ("MPL-2.0", "weak-copyleft",
      "Mozilla Public License",
      "subject to the terms of the Mozilla Public License, v. 2.0"),
    ("Apache-2.0", "permissive",
      "Apache License,? Version 2\\.0",
      "Licensed under the Apache License, Version 2.0 (the \"License\")"),
    ("MIT", "permissive",
      "Permission is hereby granted, free of charge",
      "Permission is hereby granted, free of charge, to any person obtaining a copy"),
    ("BSD-3-Clause", "permissive",
      "Redistribution and use in source and binary forms",
      "Redistribution and use in source and binary forms, with or without modification"),
    ("Unlicense", "public-domain",
      "free and unencumbered software released into the public domain",
      "This is free and unencumbered software released into the public domain."))

  private val KeepFamilies = Seq("permissive", "public-domain")

  /**
   * Per-document license verdict: (idCol, license, family, keep).
   * `headChars` bounds the probe to the file header — at 100 TB the
   * regexes never touch the body.
   */
  def licenseScan(docs: DataFrame, idCol: String, textCol: String,
      headChars: Int = 2000): DataFrame = {
    require(headChars > 0, "headChars must be positive")
    val head = substring(col(textCol), 1, headChars)
    // the regex cascade runs ONCE; family/keep derive from the spdx id
    // by cheap string CASEs, not by re-probing the text
    val license = Licenses.foldRight(lit("unknown"): Column) { (l, rest) =>
      when(head.rlike(l._3), lit(l._1)).otherwise(rest)
    }
    val family = Licenses.foldRight(lit("unknown"): Column) { (l, rest) =>
      when(col("license") === l._1, lit(l._2)).otherwise(rest)
    }
    docs.select(col(idCol), license.as("license"))
      .withColumn("family", family)
      .withColumn("keep",
        KeepFamilies.map(col("family") === _).reduce(_ || _))
  }

  /**
   * Minified/generated-code detector — the other standard code-corpus
   * gate beside the license scan (The Stack and CodeParrot both drop
   * minified/compiled-asset files before training: they are dense,
   * near-duplicate token soup that inflates loss and leaks bundled
   * third-party code). Three scan-local features decide:
   * average line length (total chars minus newlines over line count),
   * longest line, and whitespace ratio; the verdict is
   * `avg > avgLineCap OR (max > maxLineCap AND ws < wsFloor)` — a
   * single-line 50 KB bundle.js trips the first clause, a few-line
   * one the second.
   *
   * All features are codegen string kernels (length / split /
   * array_max / regexp_replace with the EXPLICIT class `[ \t\n\r]`
   * — not `\s`, whose ASCII coverage differs between Java regex and
   * RE2-based engines); ratios are exact-integer divisions rounded at
   * 6 dp. One scan, no shuffle, no UDF.
   */
  def minifiedStats(
      docs: DataFrame, idCol: String, textCol: String,
      avgLineCap: Double = 200.0, maxLineCap: Long = 500L,
      wsFloor: Double = 0.05): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val lines = split(t, "\n", -1)
    val nLines = size(lines).cast("long")
    val maxLine = array_max(transform(lines, l => length(l))).cast("long")
    val nWs = (nChars -
      length(regexp_replace(t, "[ \t\n\r]", ""))).cast("long")
    docs.select(
        col(idCol), nChars.as("n_chars"), nLines.as("n_lines"),
        maxLine.as("max_line"),
        round((nChars - (nLines - 1)).cast("double") /
          nLines.cast("double"), 6).as("avg_line"),
        round(nWs.cast("double") / nChars.cast("double"), 6).as("ws_ratio"))
      .withColumn("minified",
        col("avg_line") > avgLineCap ||
          (col("max_line") > maxLineCap && col("ws_ratio") < wsFloor))
  }

  /** Keywords PRESERVED by the Type-2 normalization (mapped to
    * per-keyword placeholders, not to ID): renaming a variable keeps
    * a clone a clone, but swapping `if` for `while` is a different
    * program. Small multi-language core, longest-match-irrelevant
    * (each is replaced on word boundaries). */
  val CloneKeywords: Seq[String] = Seq(
    "if", "else", "for", "while", "return", "def", "class", "val",
    "var", "function", "in", "range")

  /**
   * Type-2 clone normal form (Baker 1995 "parameterized duplication";
   * the token normalization SourcererCC/CCFinder apply before
   * hashing): string literals → `S`, numeric literals → `N`,
   * identifiers → `ID`, keywords kept (as placeholders), whitespace
   * collapsed. Two fragments that differ ONLY by renaming
   * identifiers / changing literals normalize identically; any
   * structural edit (operator, keyword, punctuation) does not.
   *
   * Order matters and is part of the contract: strings first (their
   * contents must not leak tokens), then numbers (so the digit-bearing
   * keyword placeholders inserted NEXT are never re-matched), then
   * keywords, then identifiers, then whitespace. Every pattern is
   * lookaround-free so Java regex (Spark) and RE2 (the oracle's
   * engine) agree byte-for-byte.
   */
  def type2NormalForm(text: Column): Column = {
    var t = regexp_replace(text, "'[^']*'|\"[^\"]*\"", " S ")
    t = regexp_replace(t, "\\b[0-9][0-9a-zA-Z_]*", " N ")
    CloneKeywords.zipWithIndex.foreach { case (kw, i) =>
      t = regexp_replace(t, s"\\b$kw\\b", s"⟨$i⟩")
    }
    t = regexp_replace(t, "[A-Za-z_][A-Za-z0-9_]*", " ID ")
    trim(regexp_replace(t, "\\s+", " "))
  }

  /**
   * Type-2 clone groups over a code corpus: normalize
   * ([[type2NormalForm]]), fingerprint (md5), group — exact-dedup
   * economics (one hash aggregate on a 32-byte key; the group-size
   * relation is |distinct forms| rows) for the clone class exact
   * dedup cannot see: the fork that renamed every variable. Output:
   * one row per document that HAS a clone (group ≥ 2) —
   * (id, clone_rep = least member id, n_clones).
   */
  def cloneGroups(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.select(col(idCol),
      md5(type2NormalForm(col(textCol)).cast("binary")).as("__fp"))
    val groups = fp.groupBy("__fp").agg(
      count(lit(1)).as("n_clones"), min(col(idCol)).as("clone_rep"))
    fp.join(groups, "__fp")
      .filter(col("n_clones") >= 2)
      .select(col(idCol), col("clone_rep"),
        col("n_clones").cast("long").as("n_clones"))
  }
}
