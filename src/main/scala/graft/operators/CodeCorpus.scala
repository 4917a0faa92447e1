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
}
