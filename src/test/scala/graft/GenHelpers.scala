package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Deterministic property sampling with raw ScalaCheck (the scalatestplus
 * bridge isn't in the offline cache). Fixed seeds => reproducible CI.
 */
trait GenHelpers {
  def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  def checkAll[T](g: Gen[T], n: Int = 200, seed: Long = 42L)(body: T => Unit): Unit =
    samples(g, n, seed).foreach(body)
}
