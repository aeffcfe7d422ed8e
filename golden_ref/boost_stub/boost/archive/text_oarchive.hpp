// Minimal text archive stand-in so the *reference* k-SLAM binary can be
// built for the golden parity harness on a machine without boost.
//
// This is NOT boost and does NOT read/write real boost archives; it only
// needs to round-trip within the reference binary itself (the binary both
// writes the database with --parse-fasta/--parse-genbank and reads it back
// for analysis, GenbankTools.h:201-206 / :336-344). The serialized types
// are primitives, std::string, std::vector, and classes exposing a public
// `serialize(Archive&, unsigned)` member.
#ifndef BOOST_STUB_TEXT_OARCHIVE_HPP
#define BOOST_STUB_TEXT_OARCHIVE_HPP

#include <ostream>
#include <string>
#include <vector>
#include <type_traits>
#include <cstdint>

namespace boost {
namespace archive {

class text_oarchive {
  std::ostream &os_;

 public:
  explicit text_oarchive(std::ostream &os) : os_(os) { os_ << "STUBAR 1\n"; }

  template <class T,
            typename std::enable_if<std::is_arithmetic<T>::value, int>::type = 0>
  text_oarchive &operator&(const T &v) {
    // `+v` promotes char-sized types so they print numerically; bool -> 0/1
    os_ << +v << ' ';
    return *this;
  }

  text_oarchive &operator&(const std::string &s) {
    os_ << s.size() << ' ';
    os_.write(s.data(), static_cast<std::streamsize>(s.size()));
    os_ << ' ';
    return *this;
  }

  template <class T>
  text_oarchive &operator&(const std::vector<T> &v) {
    (*this) & static_cast<std::uint64_t>(v.size());
    for (const auto &e : v) (*this) & e;
    return *this;
  }

  template <class T,
            typename std::enable_if<!std::is_arithmetic<T>::value, int>::type = 0>
  text_oarchive &operator&(const T &v) {
    const_cast<T &>(v).serialize(*this, 0u);
    return *this;
  }

  template <class T>
  text_oarchive &operator<<(const T &v) {
    return (*this) & v;
  }
};

}  // namespace archive
}  // namespace boost

#endif
