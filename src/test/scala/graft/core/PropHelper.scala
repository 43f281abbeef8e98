package graft.core

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal scalacheck↔scalatest bridge (org.scalatestplus is not in the
  * offline cache). */
trait PropHelper { self: org.scalatest.Assertions =>
  def check(prop: Prop, minSuccessful: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }
}
