package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.core.UrlNormalizer

/** The native Catalyst URL expressions must agree byte-for-byte with the
  * pure-Scala normalizer (which the simulator uses) and stay inside
  * whole-stage codegen. */
class UrlExpressionsSpec extends AnyFunSuite with SparkSpec {

  private val urls = Seq(
    "HTTPS://Example.COM:443/a/../b?z=1&a=2#frag",
    "http://host0.example:80/p%41x%2Fy",
    "https://user:pw@WWW.Example.org/./x/",
    "mailto:nobody@example.com",
    "javascript:void(0)",
    "https://h.example/p?",
    "not a url",
    null
  )

  test("graft_url_normalize equals UrlNormalizer.normalize for all inputs") {
    import spark.implicits._
    val out = urls.toDF("u")
      .select(col("u"), call_function("graft_url_normalize", col("u")).as("n"))
      .collect()
    out.foreach { r =>
      val u = Option(r.getString(0))
      val expected = u.flatMap(UrlNormalizer.normalize).orNull
      assert(r.getString(1) == expected, s"for url $u")
    }
  }

  test("graft_surt_host reverses the host") {
    import spark.implicits._
    val r = Seq("https://www.sub.example.com/p").toDF("u")
      .select(call_function("graft_surt_host", col("u"))).head()
    assert(r.getString(0) == "com,example,sub,www")
  }

  test("UrlFunctions column builders agree with the pure normalizer (host/path/resolve)") {
    import spark.implicits._
    import graft.functions.expressions.UrlFunctions._
    val out = urls.toDF("u")
      .select(col("u"), urlNormalize(col("u")).as("n"))
      .filter(col("n").isNotNull)
      .select(col("n"), urlHost(col("n")).as("h"), urlPath(col("n")).as("p"),
        urlResolve(col("n"), lit("../rel/x")).as("r"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getString(0)
      assert(r.getString(1) == UrlNormalizer.hostOf(n))
      assert(r.getString(2) == UrlNormalizer.pathOf(n))
      assert(Option(r.getString(3)) == UrlNormalizer.resolve(n, "../rel/x"))
    }
  }

  test("engine link-discovery projection stays inside whole-stage codegen") {
    import spark.implicits._
    import graft.functions.expressions.UrlFunctions._
    // the shape of CrawlEngine's discovered-link projection: resolve + host
    val df = spark.range(1000)
      .select(concat(lit("https://h"), col("id") % 7, lit(".example/p")).as("parentUrl"),
        concat(lit("/p"), col("id")).as("href"))
      .select(urlResolve(col("parentUrl"), col("href")).as("newNorm"))
      .filter(col("newNorm").isNotNull)
      .select(col("newNorm"), urlHost(col("newNorm")).as("host"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"not codegen'd:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"udf found in plan:\n$plan")
  }

  test("expression runs inside whole-stage codegen (no UDF barrier)") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(concat(lit("https://h"), col("id"), lit(".example/p")).as("u"))
      .select(call_function("graft_url_normalize", col("u")).as("n"))
      .filter(col("n").isNotNull)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"not codegen'd:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"udf found in plan:\n$plan")
  }
}
