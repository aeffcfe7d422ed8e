// Minimal text archive stand-in (reader half); see text_oarchive.hpp.
#ifndef BOOST_STUB_TEXT_IARCHIVE_HPP
#define BOOST_STUB_TEXT_IARCHIVE_HPP

#include <istream>
#include <string>
#include <vector>
#include <type_traits>
#include <stdexcept>
#include <cstdint>

namespace boost {
namespace archive {

class text_iarchive {
  std::istream &is_;

 public:
  explicit text_iarchive(std::istream &is) : is_(is) {
    std::string magic;
    int version = 0;
    is_ >> magic >> version;
    if (magic != "STUBAR")
      throw std::runtime_error(
          "database was not written by this stub-archive build");
  }

  template <class T,
            typename std::enable_if<std::is_arithmetic<T>::value, int>::type = 0>
  text_iarchive &operator&(T &v) {
    // read through a wide intermediate so bool / char types parse numerically
    typename std::conditional<std::is_floating_point<T>::value, double,
                              long long>::type tmp;
    is_ >> tmp;
    v = static_cast<T>(tmp);
    return *this;
  }

  text_iarchive &operator&(std::string &s) {
    std::uint64_t n = 0;
    is_ >> n;
    is_.get();  // the single separator space
    s.resize(n);
    if (n) is_.read(&s[0], static_cast<std::streamsize>(n));
    return *this;
  }

  template <class T>
  text_iarchive &operator&(std::vector<T> &v) {
    std::uint64_t n = 0;
    (*this) & n;
    v.clear();
    v.resize(n);
    for (auto &e : v) (*this) & e;
    return *this;
  }

  template <class T,
            typename std::enable_if<!std::is_arithmetic<T>::value, int>::type = 0>
  text_iarchive &operator&(T &v) {
    v.serialize(*this, 0u);
    return *this;
  }

  template <class T>
  text_iarchive &operator>>(T &v) {
    return (*this) & v;
  }
};

}  // namespace archive
}  // namespace boost

#endif
