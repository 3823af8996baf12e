package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composition of the nearline partition key from (org, metric).
  *
  * The reference abstracts key layout behind a mapper so deployments can
  * change the hash-key scheme without forking the reader
  * (`storage-dynamo/.../key/DynamoKeyMapper.java`, exercised by
  * `TestDynamoKeyMapper.java`); the readerator side only ever sees the
  * composed value. Same contract here: every place that builds or matches
  * a partition key goes through one mapper, carried on the [[SourceSet]],
  * so a deployment with a different scheme configures it in one place.
  *
  * Both directions must agree bit-for-bit: [[partitionKey]] builds the
  * literal used in pushed hash-key filters (scan/Query/GetItem planning),
  * [[partitionKeyCol]] builds the column expression used on the write path
  * (streaming ingest, fixtures). A mismatch silently reads zero rows, so
  * [[KeyMapperSpec]] pins literal/column parity for every shipped mapper.
  */
trait KeyMapper extends Serializable {

  /** The partition-key value for one (org, metric) — drives the pushed
    * `partition = <value>` filter on every nearline read. */
  def partitionKey(orgId: String, metricCanonicalId: String): String

  /** The same composition as a column expression, for write paths that
    * derive the key from data columns. Must equal [[partitionKey]] applied
    * row-wise. */
  def partitionKeyCol(org: Column, metric: Column): Column
}

object KeyMapper {

  /** Reference default: bare concatenation `org + metric` (the scheme the
    * reference's default mapper composes and its fixtures assume). */
  case object Concat extends KeyMapper {
    def partitionKey(orgId: String, metricCanonicalId: String): String =
      orgId + metricCanonicalId
    def partitionKeyCol(org: Column, metric: Column): Column =
      concat(org, metric)
  }

  /** Delimited composition — recoverable keys for deployments that need to
    * parse (org, metric) back out of the stored key. */
  final case class Delimited(delim: String = "|") extends KeyMapper {
    def partitionKey(orgId: String, metricCanonicalId: String): String =
      orgId + delim + metricCanonicalId
    def partitionKeyCol(org: Column, metric: Column): Column =
      concat(org, lit(delim), metric)
  }

  /** Hash-prefixed composition: a short md5 prefix spreads lexically
    * adjacent tenants across the keyspace — the standard hot-partition
    * remedy for range-partitioned stores at scale. Reads are unaffected
    * (still a single-value hash-key lookup); only the key text changes.
    * The inner mapper defaults to [[Delimited]]: a hash prefix is only as
    * unambiguous as the text it prefixes, and bare concatenation collides
    * for ("ab","c")/("a","bc") — deployments wanting the reference's
    * concat scheme under the prefix must opt in explicitly.
    *
    * COMPATIBILITY NOTE: before round 4 the default inner mapper was
    * [[Concat]]. Rows written under that default have a different key text
    * AND md5 prefix, so a reader on the new default cannot see them.
    * Acceptable for this greenfield release; an existing deployment
    * upgrading across the change must pin `HashPrefixed(chars, Concat)`
    * explicitly (or rewrite its keys). */
  final case class HashPrefixed(chars: Int = 4, inner: KeyMapper = Delimited("|"))
      extends KeyMapper {
    require(chars > 0 && chars <= 32, s"md5 hex prefix must be 1..32, got $chars")

    def partitionKey(orgId: String, metricCanonicalId: String): String = {
      val base = inner.partitionKey(orgId, metricCanonicalId)
      md5Hex(base).substring(0, chars) + base
    }

    def partitionKeyCol(org: Column, metric: Column): Column = {
      val base = inner.partitionKeyCol(org, metric)
      concat(substring(md5(base.cast("binary")), 1, chars), base)
    }

    private def md5Hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.map("%02x".format(_)).mkString
    }
  }
}
