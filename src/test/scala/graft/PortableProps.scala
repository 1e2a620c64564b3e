package graft

import graft.functions.Portable
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the portable primitives (SURVEY.md §5 item 4)
  * — pure-JVM invariants (no SparkSession), run by sbt's native ScalaCheck
  * integration.
  */
object PortableProps extends Properties("Portable") {

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  property("rolling hash fold matches reference implementation, non-negative") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      var h = 0L
      s.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
      val ref = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)
      h == ref && h >= 0
    }

  property("minhash permutation stays within [0, p) for all 28-bit inputs") =
    Prop.forAll(Gen.chooseNum(0L, (1L << 28) - 1)) { hval =>
      Portable.MinhashPerms.forall { case (a, b) =>
        val v = (a * hval + b) % Portable.MinhashPrime
        v >= 0 && v < Portable.MinhashPrime
      }
    }

  property("simhash digest prefix equals hex-string parse for any token") =
    Prop.forAll(word) { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(tok.getBytes("UTF-8"))
      val viaBits = ((digest(0) & 0xffL) << 20) | ((digest(1) & 0xffL) << 12) |
        ((digest(2) & 0xffL) << 4) | ((digest(3) & 0xf0L) >> 4)
      val hex = digest.map("%02x".format(_)).mkString.take(7)
      viaBits == java.lang.Long.parseLong(hex, 16)
    }

  property("hash28Jvm bit-twiddle equals hex-string parse for any token") =
    Prop.forAll(word) { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Portable.hash28Jvm(tok) == java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }

  property("publisher fixture: count invariant over any user/size choice") =
    Prop.forAll(Gen.chooseNum(1, 5), Gen.chooseNum(1, 20)) { (users, perUser) =>
      val lines = graft.tools.Publisher.messageLines(0 until users, perUser, 1704100000L)
      lines.size == users * perUser && lines.forall(_.contains("\"click\": 1"))
    }
}
